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


class _GridProposer:
    """Class-agnostic dense window proposals (automask protocol stand-in).

    NO ground truth reaches the proposals: every multi-scale window over the
    image is proposed, so localization must come entirely from the
    detector's classification + background suppression."""

    def generate(self, img):
        h, w = img.shape[:2]
        anns = []
        for size in (16, 24, 36):
            for y0 in range(0, max(h - size, 1), size // 2):
                for x0 in range(0, max(w - size, 1), size // 2):
                    seg = np.zeros((h, w), bool)
                    seg[y0 : y0 + size, x0 : x0 + size] = True
                    anns.append(
                        dict(
                            segmentation=seg,
                            bbox=[x0, y0, min(size, w - x0), min(size, h - y0)],
                            predicted_iou=1.0,
                        )
                    )
        return [anns]


class _ColorCLIP:
    """Color-sensitive stand-in for the CLIP towers (no public weights exist
    in this sandbox): embeds a crop as its dominant-color direction plus a
    'background-ness' channel (1 - color purity), and class texts by
    keyword. A functioning CLIP separates classes far better than this; if
    the detector localizes with THIS, the glue is sound."""

    PALETTE = {
        "red": [1.0, 0.1, 0.1], "green": [0.1, 1.0, 0.1],
        "blue": [0.1, 0.1, 1.0],
    }

    def __init__(self):
        import types

        self.tower = types.SimpleNamespace(image_size=16)

    def encode_image(self, crops):  # [K, S, S, 3] float [0,1], masked
        out = []
        for c in crops:
            lit = c.sum(-1) > 0.06  # ignore black mask/pad pixels
            e = c[lit].mean(0) if lit.any() else np.zeros(3)
            purity = (e.max() - e.min()) / max(e.max(), 1e-6)
            out.append([e[0], e[1], e[2], max(0.0, 1.0 - 1.5 * purity)])
        out = np.asarray(out, np.float32)
        return out / (np.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)

    def extract_text_feature(self, texts):
        rows = []
        for t in texts:
            vec = [0.0, 0.0, 0.0, 1.0]  # 'background' and anything unknown
            for name, rgb in self.PALETTE.items():
                if name in t:
                    vec = list(rgb) + [0.0]
            rows.append(vec)
        rows = np.asarray(rows, np.float32)
        return rows / np.linalg.norm(rows, axis=-1, keepdims=True)


@pytest.mark.slow
def test_native_detector_localizes_planted_objects(planted):
    """NativeOpenVocabDetector QUALITY on the planted scene (VERDICT r3
    item 6): rendered views of three color-coded clusters, dense
    class-agnostic window proposals, a color-CLIP stand-in — the detector
    must LOCALIZE (recall 1.0 at IoU>=0.2 over visible planted objects,
    box-label pixel accuracy well above the 1/3 chance floor) and CLASSIFY
    (every confident detection overlaps its own class's extent). Converts
    round 3's 'runs as protocol glue' into 'detects'. Ref behavior target:
    /root/reference/model/vlpart_predictor.py:62-126."""
    import dataclasses

    from semantic_gaussians_tpu.models.vlpart import NativeOpenVocabDetector
    from semantic_gaussians_tpu.renderer import render

    p = planted
    names = list(_ColorCLIP.PALETTE)  # class k -> color name k
    colors = np.asarray([_ColorCLIP.PALETTE[n] for n in names], np.float32)
    params = dataclasses.replace(
        p["params"],
        sh_dc=jnp.asarray(  # solid class colors (inverse SH-DC activation)
            (colors[p["cls"] % 3] - 0.5) / 0.28209479177387814
        )[:, None, :],
        sh_rest=jnp.zeros_like(p["params"].sh_rest),
    )
    clip = _ColorCLIP()
    det = NativeOpenVocabDetector(
        _GridProposer(), clip, clip, vocabulary=names, prefix_prompt="a ",
    )

    n_views = checked = 0
    accs = []
    for cam, gt in zip(p["cams"], p["gts"]):
        img = np.asarray(
            render(cam, params, alive=jnp.asarray(p["alive"]),
                   backend="dense")["render"]
        )
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        boxes, scores, classes = det(img8)
        n_views += 1
        # GT extents from the planted label maps (gt: K = unlabeled)
        order = np.argsort(-scores)
        label_img = np.full(gt.shape, len(names), np.int64)
        for i in order[::-1]:  # low->high so high-score boxes paint last
            x1, y1, x2, y2 = boxes[i].astype(int)
            label_img[y1:y2, x1:x2] = classes[i]
        for k in range(len(names)):
            ys, xs = np.where(gt == k)
            if len(ys) < 40:  # class barely visible in this view
                continue
            gx1, gy1, gx2, gy2 = xs.min(), ys.min(), xs.max() + 1, ys.max() + 1
            dets_k = [i for i in order if classes[i] == k]
            assert dets_k, f"class {names[k]} missed entirely in view"
            best_iou = 0.0
            for i in dets_k:
                x1, y1, x2, y2 = boxes[i]
                ix = max(0.0, min(x2, gx2) - max(x1, gx1))
                iy = max(0.0, min(y2, gy2) - max(y1, gy1))
                inter = ix * iy
                union = (x2 - x1) * (y2 - y1) + (gx2 - gx1) * (gy2 - gy1) - inter
                best_iou = max(best_iou, inter / union)
                if i == dets_k[0]:  # most confident: must touch its class
                    assert inter > 0, (
                        f"top {names[k]} detection misses the object"
                    )
            assert best_iou >= 0.2, (names[k], best_iou)
            checked += 1
        # box-label pixel accuracy on GT-labeled pixels (chance = 1/3)
        labeled = gt < len(names)
        if labeled.sum() > 200:
            accs.append((label_img[labeled] == gt[labeled]).mean())
    assert checked >= 2 * n_views  # >=2 of 3 classes checked per view
    assert np.mean(accs) > 0.55, f"box-label acc {np.mean(accs):.3f}"


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
