"""Synthetic closed-loop mIoU: plant GT classes -> fuse -> distill -> eval.

VERDICT r2 item 5: converts "all 5 eval modes execute" into "the pipeline
measurably segments" with no external data. Three spatially separated
clusters carry planted class identities; an ORACLE 2D provider emits the
exact class text feature at every GT-labeled pixel (a perfect open-vocab
segmenter). Fusion back-projects those maps onto the Gaussians, the sparse
3D UNet distills them from raw Gaussian parameters, and the eval path must
reproduce the planted labels at mIoU ~ 1 (2d mode) / > 0.9 (3d mode after
distillation). Mirrors the reference chain fusion.py -> distill.py ->
eval_segmentation.py (ref eval_segmentation.py:63-168, utils/metric.py:35-105).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd, packed_features
from semantic_gaussians_tpu.models.predictors import RandomFeatureProvider
from semantic_gaussians_tpu.pipelines.eval_segmentation import (
    EvalAccumulator,
    eval_views,
    predict_label_image,
    text_feature_matrix,
    voxel_feats_to_gaussians,
    voxelize_for_net,
)
from semantic_gaussians_tpu.pipelines.fusion import FusionConfig, fuse_scene
from semantic_gaussians_tpu.utils.camera import make_camera

LABELS = ["slab", "ball", "box"]
D = 16
W, H = 96, 64


def _planted_scene(rng, cap=512):
    """Three separated clusters, one class each; class id per Gaussian."""
    centers = np.array([[-0.9, 0.0, 3.0], [0.0, 0.3, 3.2], [0.9, -0.2, 3.0]])
    pts, cls = [], []
    for k, c in enumerate(centers):
        # uniform ball (bounded support): no outliers, so 3-NN init scales
        # stay small and no fat Gaussian blankets another cluster's pixels
        v = rng.normal(size=(130, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        r = 0.3 * rng.uniform(0, 1, (130, 1)) ** (1 / 3)
        pts.append(v * r + c)
        cls.append(np.full(130, k))
    pts = np.concatenate(pts).astype(np.float32)
    cls = np.concatenate(cls)
    cols = rng.uniform(size=(len(pts), 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=cap)
    cls_full = np.zeros(cap, np.int64)
    cls_full[: len(cls)] = cls
    return params, alive, cls_full


def _cams(k=10):
    """Orbit ring around the cluster centroid: every Gaussian is front-facing
    in some view, so fusion visits (nearly) the whole scene."""
    from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w

    center = np.array([0.0, 0.0, 3.07])
    cams = []
    for i in range(k):
        ang = 2 * np.pi * i / k
        pos = center + np.array(
            [2.6 * np.sin(ang), 0.5, -2.6 * np.cos(ang)]
        )
        fwd = center - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, upv, fwd], axis=1)
        c2w[:3, 3] = pos
        cams.append(make_camera_from_c2w(c2w, 1.25, 0.9, W, H))
    return cams


class OracleProvider:
    """Perfect 2D segmenter: per-pixel feature = class text row of the GT
    label map (zeros on unlabeled pixels)."""

    def __init__(self, maps, text, embedding_dim):
        self.maps = maps  # path -> [H, W] ids in [0, K]
        self.text = text  # [K+1, D], row 0 = other
        self.embedding_dim = embedding_dim

    def extract_image_feature(self, img_path, img_size):
        gt = self.maps[str(img_path)]
        k = self.text.shape[0] - 1
        feat = np.where(
            (gt == k)[..., None],
            np.zeros((1, self.embedding_dim), np.float32),
            self.text[np.minimum(gt + 1, k)],
        )
        assert img_size is None or tuple(img_size) == (gt.shape[1], gt.shape[0])
        return feat.astype(np.float32)

    def extract_text_feature(self, labelset):
        raise NotImplementedError


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(7)
    params, alive, cls = _planted_scene(rng)
    enc = RandomFeatureProvider(embedding_dim=D)
    text = text_feature_matrix(enc, LABELS)  # [4, D]
    cams = _cams()
    gt_maps = {}
    gts = []
    ideal = jnp.asarray(text[cls + 1])  # exact class feature per Gaussian
    for i, cam in enumerate(cams):
        gt = np.asarray(
            predict_label_image(
                cam, params, jnp.asarray(alive), ideal, jnp.asarray(text),
                pred_on_3d=True, backend="dense",
            )
        )
        gt_maps[f"v{i}"] = gt
        gts.append(gt.astype(np.int64))
    provider = OracleProvider(gt_maps, text, D)
    feats, visited = fuse_scene(
        params, alive, cams, provider,
        FusionConfig(
            img_dim=(W, H), every_k_views=1, depth="render",
            cut_boundary=0, visibility_threshold=0.1, chunk_views=4,
        ),
        image_paths=[f"v{i}" for i in range(len(cams))], backend="dense",
    )
    return dict(
        params=params, alive=alive, cls=cls, text=text, cams=cams,
        gts=gts, fused=np.asarray(feats), visited=np.asarray(visited),
    )


@pytest.mark.slow
def test_closed_loop_2d_miou(planted):
    """Fused features (2d mode) reproduce the planted labels at mIoU ~ 1."""
    p = planted
    assert p["visited"].sum() > 300  # fusion actually reached the scene
    miou, macc, _ = eval_views(
        p["cams"], p["gts"], p["params"], jnp.asarray(p["alive"]),
        jnp.asarray(p["fused"]), p["text"], LABELS,
        pred_on_3d=True, backend="dense", chunk_views=4, stdout=False,
    )
    assert miou > 0.95, miou
    assert macc > 0.95, macc


@pytest.mark.slow
def test_closed_loop_distill_3d_miou(planted, tmp_path):
    """Distilled 3D-UNet features (3d mode) segment the planted scene at
    mIoU > 0.9 — the full fusion -> distill -> eval closed loop."""
    from semantic_gaussians_tpu.io.ply import save_gaussian_ply
    from semantic_gaussians_tpu.models.unet3d import mink_unet
    from semantic_gaussians_tpu.pipelines.distill import (
        DistillConfig,
        FeatureDataset,
        train_distill,
    )
    from semantic_gaussians_tpu.pipelines.fusion import save_fused_features

    p = planted
    params, alive = p["params"], p["alive"]
    ply = tmp_path / "point_cloud.ply"
    save_gaussian_ply(ply, params, np.asarray(alive))
    fused = tmp_path / "0.pt"
    save_fused_features(fused, p["fused"], p["visited"])

    voxel, budget = 0.08, 512
    ds = FeatureDataset(
        [str(ply)], [str(fused)], voxel_size=voxel, aug=False,
        voxel_budget=budget,
    )
    cfg = DistillConfig(
        model_3d="MinkUNet14A", feature_dim=D, in_channels=56, epochs=120,
        lr=3e-3,
    )
    model, variables, losses = train_distill(ds, cfg, num_epochs=cfg.epochs)
    assert losses[-1] < 0.25, losses[-1]  # cosine loss ~ converged

    n_alive = int(np.asarray(alive).sum())
    locs = np.asarray(params.means)[:n_alive]
    pf = np.asarray(packed_features(params, alive, "all"))[:n_alive]
    feats_in, topo, inverse, num_valid = voxelize_for_net(
        locs, pf, voxel, budget
    )
    net = mink_unet(pf.shape[-1], D, "MinkUNet14A")
    vout = net.apply(variables, feats_in, topo, train=False)
    feats_3d = voxel_feats_to_gaussians(
        np.asarray(vout), inverse, n_alive, params.capacity,
        num_valid=num_valid,
    )
    miou, macc, _ = eval_views(
        p["cams"], p["gts"], params, jnp.asarray(alive), feats_3d,
        p["text"], LABELS, pred_on_3d=True, backend="dense",
        chunk_views=4, stdout=False,
    )
    assert miou > 0.9, miou
