"""2D->3D versatile projection: fuse per-view 2D features onto Gaussians.

Parity: /root/reference/fusion.py fuse_one_scene (:23-257) — every k-th
training view, per-pixel feature maps from a 2D predictor, depth-based
occlusion test (depth from 'image' | 'render' | 'surface' | none), masked
accumulate of features and visit counters per Gaussian, average at the end,
fp16 output with a visited mask (+ optional random point-subset files for
distill training, :227-257).

The per-view accumulate is one jitted function (projection + occlusion +
gather + scatter-add all on device); the 2D model runs wherever it lives
(host / offline exports) — the reference treats it the same way.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..data.fusion_utils import compute_mapping, surface_depth
from ..renderer import render
from ..utils.camera import Camera, fov2focal


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    img_dim: tuple = (648, 484)  # feature-map (W, H), fusion_scannet.yaml
    every_k_views: int = 5  # fusion.py:61-62
    depth: str = "render"  # image | render | surface | none
    depth_scale: float = 1000.0
    visibility_threshold: float = 0.05
    cut_boundary: int = 10


def _intrinsic_for(camera: Camera, img_dim) -> np.ndarray:
    w, h = img_dim
    k = np.eye(3, dtype=np.float32)
    k[0, 0] = fov2focal(camera.fov_x, w)
    k[1, 1] = fov2focal(camera.fov_y, h)
    k[0, 2] = w / 2.0
    k[1, 2] = h / 2.0
    return k


@partial(jax.jit, static_argnames=("img_dim", "vis_thres", "cut_bound"))
def fuse_view(
    sem_sum: jnp.ndarray,  # [cap, C]
    counts: jnp.ndarray,  # [cap]
    means: jnp.ndarray,  # [cap, 3]
    alive: jnp.ndarray,  # [cap]
    world_view: jnp.ndarray,  # [4,4]
    intrinsic: jnp.ndarray,  # [3,3]
    feat_map: jnp.ndarray,  # [H, W, C]
    depth_map: Optional[jnp.ndarray],  # [H, W] or None
    img_dim: tuple,
    vis_thres: float,
    cut_bound: int,
):
    """Accumulate one view's features onto the Gaussians (fusion.py:126-144)."""
    mapping = compute_mapping(
        world_view, means, intrinsic, img_dim, depth_map, vis_thres, cut_bound
    )
    v, u, mask = mapping[:, 0], mapping[:, 1], mapping[:, 2]
    mask = (mask > 0) & alive
    feats = feat_map[v, u]  # [cap, C]
    sem_sum = sem_sum + jnp.where(mask[:, None], feats, 0.0)
    counts = counts + mask.astype(counts.dtype)
    return sem_sum, counts


def fuse_scene(
    params: GaussianParams,
    alive: jnp.ndarray,
    cameras: Sequence[Camera],
    feature_provider,
    cfg: FusionConfig = FusionConfig(),
    image_paths: Optional[Sequence[str]] = None,
    depth_paths: Optional[Sequence[str]] = None,
    tile_shape=None,
    backend: str = "pallas",
):
    """Fuse features over every k-th view.

    Returns (features [cap, C] float32 averaged, visited [cap] bool).
    """
    c = feature_provider.embedding_dim
    cap = params.capacity
    sem = jnp.zeros((cap, c), jnp.float32)
    counts = jnp.zeros((cap,), jnp.float32)
    w, h = cfg.img_dim

    views = list(range(len(cameras)))[:: cfg.every_k_views]
    for vi in views:
        cam = cameras[vi]
        path = (
            image_paths[vi]
            if image_paths is not None
            else (cam.image_name or str(vi))
        )
        feat = jnp.asarray(
            feature_provider.extract_image_feature(path, cfg.img_dim)
        )
        intrinsic = jnp.asarray(_intrinsic_for(cam, cfg.img_dim))

        if cfg.depth == "render":
            out = render(
                cam,
                params,
                alive=alive,
                override_shape=cfg.img_dim,
                tile_shape=tile_shape,
                backend=backend,
            )
            depth_map = out["depth"]
        elif cfg.depth == "image":
            from PIL import Image

            d = np.asarray(Image.open(depth_paths[vi])).astype(np.float32)
            if d.shape != (h, w):
                d = np.asarray(
                    Image.fromarray(d).resize((w, h), Image.NEAREST)
                )
            depth_map = jnp.asarray(d / cfg.depth_scale)
        elif cfg.depth == "surface":
            depth_map = surface_depth(
                cam.world_view, params.means, intrinsic, cfg.img_dim,
                cfg.cut_boundary, valid=alive,
            )
        elif cfg.depth in (None, "none", "None"):
            depth_map = None
        else:
            raise ValueError(f"unknown depth mode {cfg.depth!r}")

        sem, counts = fuse_view(
            sem, counts, params.means, alive, cam.world_view, intrinsic,
            feat, depth_map, cfg.img_dim, cfg.visibility_threshold,
            cfg.cut_boundary,
        )

    visited = counts > 0
    features = sem / jnp.maximum(counts[:, None], 1.0)
    return features, visited


def save_fused_features(
    out_path,
    features: np.ndarray,
    visited: np.ndarray,
    n_split_points: int = 999_999_999,
    num_rand_file_per_scene: int = 1,
    seed: int = 0,
):
    """Reference-compatible fused-feature checkpoints: torch .pt dicts
    {feat: half [M, C], mask_full: bool [N]} with optional random point
    subsets for training (fusion.py:227-257)."""
    import torch

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    features = np.asarray(features)
    visited = np.asarray(visited).astype(bool)
    n = visited.shape[0]
    n_vis = int(visited.sum())
    rng = np.random.default_rng(seed)
    for k in range(num_rand_file_per_scene):
        if n_split_points < n_vis:
            sel_idx = rng.choice(np.where(visited)[0], n_split_points, replace=False)
            mask_full = np.zeros(n, bool)
            mask_full[sel_idx] = True
        else:
            mask_full = visited
        feat = torch.from_numpy(features[mask_full]).half()
        name = (
            out_path
            if num_rand_file_per_scene == 1
            else out_path.with_name(f"{out_path.stem}_{k}{out_path.suffix}")
        )
        torch.save(
            {"feat": feat, "mask_full": torch.from_numpy(mask_full)}, name
        )


def load_fused_features(path, capacity: Optional[int] = None):
    """Load a {feat, mask_full} .pt file -> (features [cap, C], visited)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    mask = obj["mask_full"].numpy().astype(bool)
    feat = obj["feat"].float().numpy()
    n = mask.shape[0]
    cap = capacity or n
    c = feat.shape[-1]
    out = np.zeros((cap, c), np.float32)
    out_mask = np.zeros(cap, bool)
    out_mask[:n] = mask
    out[np.where(out_mask)[0]] = feat
    return jnp.asarray(out), jnp.asarray(out_mask)
