"""Open-vocabulary segmentation evaluation (mIoU / mAcc).

Parity: /root/reference/eval_segmentation.py — five modes (:51-60):
  '2d'        fused per-Gaussian features
  '3d'        distilled UNet output (voxel -> Gaussian scatter-back)
  '2d_and_3d' ensemble: 'concat' (feature concat) or 'argmax' (max of sims)
  'pretrained' 2D model directly on eval views
  'labelmap'  precomputed per-view label images
and two prediction paths per mode (:131-157):
  pred_on_3d=True : per-Gaussian argmax -> render one-hot class vectors ->
                    per-pixel argmax
  pred_on_3d=False: render raw features -> normalize -> dot text -> argmax
Text matrix has 'other' prepended at row 0 (render_utils.py:9-23); predicted
train-ids are the argmax index - 1, with 'other'/unlabeled mapping to the
confusion matrix's unlabeled column (metric.py semantics).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..renderer import render_chn
from ..utils.camera import Camera
from ..utils.metrics import (
    confusion_matrix,
    confusion_matrix_device,
    evaluate_confusion,
)


def text_feature_matrix(text_encoder, class_labels: Sequence[str]) -> np.ndarray:
    """[K+1, D] normalized text features with 'other' at row 0."""
    labelset = ["other"] + list(class_labels)
    feats = text_encoder.extract_text_feature(labelset)
    return np.asarray(feats, np.float32)


def _normalize(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def predict_label_image(
    camera: Camera,
    params: GaussianParams,
    alive: jnp.ndarray,
    gauss_feats: jnp.ndarray,  # [cap, D]
    text: jnp.ndarray,  # [K+1, D] ('other' row 0)
    pred_on_3d: bool = False,
    backend: str = "pallas",
    tile_shape=None,
    pair_budget: Optional[int] = None,
) -> jnp.ndarray:
    """[H, W] int32 predicted ids in [0, K]; K = unlabeled/other
    (class ids 0-based, 'other'/empty mapped to K).

    `pair_budget` matters at scale in the pred_on_3d=False path: the
    capacity-derived default budget sizes the [C+rows, budget] pack buffer,
    which at C=512 costs 2 KB/pair — pass the scene's tuned budget."""
    kp1 = text.shape[0]
    num_classes = kp1 - 1
    if pred_on_3d:
        sims = _normalize(gauss_feats) @ text.T  # [cap, K+1]
        cls = jnp.argmax(sims, axis=-1)  # 0 = other
        onehot = jax.nn.one_hot(cls, kp1) * alive[:, None]
        out = render_chn(
            camera, params, onehot, alive=alive, backend=backend,
            tile_shape=tile_shape, pair_budget=pair_budget,
        )
        pix = jnp.argmax(out["render"], axis=-1)  # [H, W] in [0, K]
    else:
        out = render_chn(
            camera, params, gauss_feats, alive=alive, backend=backend,
            tile_shape=tile_shape, pair_budget=pair_budget,
        )
        pf = _normalize(out["render"])  # [H, W, D]
        sims = jnp.einsum("hwd,kd->hwk", pf, text)
        pix = jnp.argmax(sims, axis=-1)
    # 0 ('other') -> num_classes (unlabeled col); else id - 1
    return jnp.where(pix == 0, num_classes, pix - 1).astype(jnp.int32)


def ensemble_features(
    feats_2d: jnp.ndarray, feats_3d: jnp.ndarray, mode: str = "concat"
):
    """'concat' ensemble: stacked normalized features (text is tiled by the
    caller); for 'argmax' use ensemble_sims (eval_segmentation.py:361-443)."""
    if mode != "concat":
        raise ValueError("use ensemble_sims for argmax mode")
    return jnp.concatenate(
        [_normalize(feats_2d), _normalize(feats_3d)], axis=-1
    )


def ensemble_argmax_class(
    feats_2d: jnp.ndarray, feats_3d: jnp.ndarray, text: jnp.ndarray
) -> jnp.ndarray:
    """Per-Gaussian class by max similarity over both feature sets."""
    s2 = _normalize(feats_2d) @ text.T
    s3 = _normalize(feats_3d) @ text.T
    return jnp.argmax(jnp.maximum(s2, s3), axis=-1)


def voxel_feats_to_gaussians(
    voxel_feats: np.ndarray,
    inverse: np.ndarray,
    n_gaussians: int,
    cap: int,
    num_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Scatter per-voxel UNet outputs back to per-Gaussian features via the
    voxelizer's point->voxel map (eval '3d' mode). Gaussians mapped to a
    voxel id >= num_valid (dropped by the static voxel budget) receive a
    zero feature row instead of indexing out of bounds."""
    vf = np.asarray(voxel_feats)
    inv = np.asarray(inverse[:n_gaussians])
    if num_valid is not None and inv.size and int(inv.max(initial=0)) >= num_valid:
        vf = np.concatenate([vf, np.zeros((1, vf.shape[-1]), vf.dtype)])
        inv = np.where(inv < num_valid, inv, len(vf) - 1)
    out = np.zeros((cap, vf.shape[-1]), np.float32)
    out[:n_gaussians] = vf[inv]
    return jnp.asarray(out)


def voxelize_for_net(
    locs: np.ndarray,  # [N, 3] world positions (alive prefix)
    point_feats: np.ndarray,  # [N, F] packed Gaussian features
    voxel_size: float,
    voxel_budget: int,
):
    """Voxelize points and pad to the static voxel budget for the sparse
    UNet: returns (feats_in [budget, F] jnp, topo, inverse [N] np,
    num_valid). Shared by the eval '3d'/'2d_and_3d' modes and distill's
    periodic eval render. Voxels beyond the budget are DROPPED (warned);
    pass num_valid to voxel_feats_to_gaussians so affected Gaussians get
    zero features rather than an out-of-bounds gather."""
    from ..data.fusion_utils import Voxelizer
    from ..models.unet3d import build_topology

    vox = Voxelizer(voxel_size=voxel_size)
    vc, vf, _, inverse, _ = vox.voxelize(locs, point_feats)
    v = min(len(vc), voxel_budget)
    if len(vc) > voxel_budget:
        print(
            f"WARNING: {len(vc) - voxel_budget} voxels over the "
            f"{voxel_budget} budget dropped (raise distill.voxel_budget)"
        )
    coords = np.zeros((voxel_budget, 3), np.int32)
    coords[:v] = vc[:v]
    feats_in = np.zeros((voxel_budget, point_feats.shape[-1]), np.float32)
    feats_in[:v] = vf[:v]
    mask = np.arange(voxel_budget) < v
    topo = build_topology(jnp.asarray(coords), jnp.asarray(mask))
    return jnp.asarray(feats_in), topo, inverse, v


@dataclasses.dataclass
class EvalAccumulator:
    num_classes: int
    confusion: np.ndarray = None

    def __post_init__(self):
        if self.confusion is None:
            self.confusion = np.zeros(
                (self.num_classes, self.num_classes + 1), np.int64
            )

    def add_view(self, pred_ids: np.ndarray, gt_ids: np.ndarray):
        """pred/gt [H, W]; ids in [0, num_classes] (num_classes = unlabeled)."""
        self.confusion += confusion_matrix(
            pred_ids.reshape(-1), gt_ids.reshape(-1), self.num_classes
        )

    def report(self, class_names, stdout=True, log_file=None, dataset="eval"):
        return evaluate_confusion(
            self.confusion, class_names, stdout=stdout, dataset=dataset,
            log_file=log_file,
        )


@partial(
    jax.jit,
    static_argnames=("num_classes", "pred_on_3d", "backend", "pair_budget"),
)
def _eval_chunk(
    cam_stack: Camera,  # array leaves stacked, leading K
    gt_stack: jnp.ndarray,  # [K, H, W] int32 ids in [0, num_classes]
    params: GaussianParams,
    alive: jnp.ndarray,
    gauss_feats: jnp.ndarray,
    text: jnp.ndarray,
    num_classes: int,
    pred_on_3d: bool,
    backend: str,
    pair_budget: Optional[int] = None,
):
    """K views -> summed confusion in ONE dispatch (lax.scan over views).

    The per-view [H, W, C] feature render, similarity map and label image
    all stay on device; only a [num_classes, num_classes+1] confusion sum
    comes back. This is the serving-shape eval path — the per-view python
    loop pays one host->device round trip per view (~90 ms over this
    sandbox's tunnel) which dwarfs the render itself at eval resolutions.
    """

    def body(conf, inp):
        cam, gt = inp
        pred = predict_label_image(
            cam, params, alive, gauss_feats, text, pred_on_3d, backend,
            pair_budget=pair_budget,
        )
        return conf + confusion_matrix_device(pred, gt, num_classes), None

    conf0 = jnp.zeros((num_classes, num_classes + 1), jnp.int32)
    conf, _ = jax.lax.scan(body, conf0, (cam_stack, gt_stack))
    return conf


def _stack_eval_views(cameras, gt_label_images):
    """Stacked (Camera, gt [K,H,W] int32) if all views share static camera
    fields and label-image shapes; None otherwise (caller falls back)."""
    from .train import stack_camera_chunk

    gts = [np.asarray(g) for g in gt_label_images]
    if len({g.shape for g in gts}) != 1:
        return None
    cam_stack = stack_camera_chunk(list(cameras))
    if cam_stack is None:
        return None
    return cam_stack, jnp.asarray(np.stack(gts).astype(np.int32))


def eval_views(
    cameras: Sequence[Camera],
    gt_label_images: Sequence[np.ndarray],
    params: GaussianParams,
    alive: jnp.ndarray,
    gauss_feats: jnp.ndarray,
    text: np.ndarray,
    class_labels: Sequence[str],
    pred_on_3d: bool = False,
    backend: str = "pallas",
    stdout: bool = False,
    log_file: Optional[str] = None,
    chunk_views: int = 8,
    pair_budget: Optional[int] = None,
):
    """Evaluate one scene over its views. Returns (mIoU, mAcc, confusion).

    Views are evaluated in device-side chunks of `chunk_views` (one dispatch
    per chunk; only confusion matrices leave the chip). chunk_views=0, or
    heterogeneous cameras / label shapes, fall back to the per-view loop.
    """
    num_classes = len(class_labels)
    acc = EvalAccumulator(num_classes)
    text_j = jnp.asarray(text)
    todo = list(zip(cameras, gt_label_images))
    # Full chunks only (a ragged tail would cost a second slow TPU compile);
    # the remainder goes through the per-view loop below.
    while chunk_views > 1 and len(todo) >= chunk_views:
        chunk, rest = todo[:chunk_views], todo[chunk_views:]
        stacked = _stack_eval_views([c for c, _ in chunk], [g for _, g in chunk])
        if stacked is None:
            break
        todo = rest
        conf = _eval_chunk(
            stacked[0], stacked[1], params, alive, gauss_feats, text_j,
            num_classes, pred_on_3d, backend, pair_budget,
        )
        acc.confusion += np.asarray(conf).astype(np.int64)
    for cam, gt in todo:
        pred = predict_label_image(
            cam, params, alive, gauss_feats, text_j, pred_on_3d, backend,
            pair_budget=pair_budget,
        )
        acc.add_view(np.asarray(pred), np.asarray(gt))
    miou, macc = acc.report(
        class_labels, stdout=stdout, log_file=log_file
    )
    return miou, macc, acc.confusion
