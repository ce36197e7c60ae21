"""Fusion geometry: point->image mapping with occlusion, and voxelization.

Parity: /root/reference/dataset/fusion_utils.py —
  PointCloudToImageMapper (:17-78): rescale intrinsics to the feature-map
  resolution, project N points with K [R|t], round to pixels, bounds test
  with cut_bound margin, occlusion |depth[px] - z| <= vis_thres * depth;
  "surface" mode synthesizes the z-buffer from the points themselves.
  Voxelizer (:81-211) + sparse_quantize (:248-341): augment (per-axis random
  rotation, scale, translation), floor-quantize, dedupe.

The mapper is vectorized jnp (jit-safe, used on-device in the fusion loop);
the voxelizer is host-side NumPy (data preparation, like the reference's
DataLoader workers) with a sort-based dedupe instead of FNV hashing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def adjust_intrinsic(
    intrinsic: np.ndarray,
    intrinsic_image_dim: Tuple[int, int],
    image_dim: Tuple[int, int],
) -> np.ndarray:
    """Rescale a 3x3/4x4 intrinsic matrix to a new image size
    (fusion_utils.py:22-28 behavior, reference resize convention)."""
    if tuple(intrinsic_image_dim) == tuple(image_dim):
        return intrinsic
    intrinsic = intrinsic.copy().astype(np.float64)
    rx = image_dim[0] / intrinsic_image_dim[0]
    ry = image_dim[1] / intrinsic_image_dim[1]
    intrinsic[0, 0] *= rx
    intrinsic[1, 1] *= ry
    # account for pixel-center offset like the reference resize
    intrinsic[0, 2] *= (image_dim[0] - 1) / (intrinsic_image_dim[0] - 1)
    intrinsic[1, 2] *= (image_dim[1] - 1) / (intrinsic_image_dim[1] - 1)
    return intrinsic


def compute_mapping(
    world_to_camera: jnp.ndarray,  # [4,4]
    coords: jnp.ndarray,  # [N,3]
    intrinsic: jnp.ndarray,  # [3,3] or [4,4] (at feature-map scale)
    image_dim: Tuple[int, int],  # (width, height)
    depth: Optional[jnp.ndarray] = None,  # [H,W] z-buffer or None
    vis_thres: float = 0.25,
    cut_bound: int = 0,
) -> jnp.ndarray:
    """[N, 3] int array of (v, u, mask); mask=1 where the point maps to a
    visible pixel (fusion_utils.compute_mapping, :29-78)."""
    n = coords.shape[0]
    p = coords @ world_to_camera[:3, :3].T + world_to_camera[:3, 3]
    z = p[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    u = jnp.round(fx * p[:, 0] / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * p[:, 1] / z_safe + cy).astype(jnp.int32)
    w, h = image_dim
    inside = (
        (u >= cut_bound)
        & (v >= cut_bound)
        & (u < w - cut_bound)
        & (v < h - cut_bound)
        & (z > 0)
    )
    if depth is not None:
        u_safe = jnp.clip(u, 0, w - 1)
        v_safe = jnp.clip(v, 0, h - 1)
        d = depth[v_safe, u_safe]
        occ_ok = (d > 0) & (jnp.abs(d - z) <= vis_thres * d)
        mask = inside & occ_ok
    else:
        mask = inside
    out = jnp.stack(
        [jnp.where(mask, v, 0), jnp.where(mask, u, 0), mask.astype(jnp.int32)],
        axis=-1,
    )
    return out


def surface_depth(
    world_to_camera: jnp.ndarray,
    coords: jnp.ndarray,
    intrinsic: jnp.ndarray,
    image_dim: Tuple[int, int],
    cut_bound: int = 0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Synthesize a z-buffer from the points themselves (depth='surface',
    fusion_utils.py:57-61): per-pixel min depth via scatter-min.

    Exact-parity masks: only points with z > 0.2 that pass the cut_bound
    inside-bounds test contribute to the pseudo z-buffer (the reference's
    loop condition `p[2,i] > 0.2 and inside_mask[i]`). `valid` masks out
    capacity-padding / dead slots (the reference operates on unpadded
    arrays): an inert slot parked at the origin would otherwise write a
    bogus near depth and occlude every real point behind its pixel."""
    w, h = image_dim
    p = coords @ world_to_camera[:3, :3].T + world_to_camera[:3, 3]
    z = p[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = jnp.round(intrinsic[0, 0] * p[:, 0] / z_safe + intrinsic[0, 2]).astype(
        jnp.int32
    )
    v = jnp.round(intrinsic[1, 1] * p[:, 1] / z_safe + intrinsic[1, 2]).astype(
        jnp.int32
    )
    ok = (
        (u >= cut_bound)
        & (v >= cut_bound)
        & (u < w - cut_bound)
        & (v < h - cut_bound)
        & (z > 0.2)
    )
    if valid is not None:
        ok = ok & valid
    idx = jnp.where(ok, v * w + u, h * w)  # out-of-range dropped
    buf = jnp.full((h * w + 1,), jnp.inf)
    buf = buf.at[idx].min(jnp.where(ok, z, jnp.inf))
    zb = buf[: h * w].reshape(h, w)
    return jnp.where(jnp.isfinite(zb), zb, 0.0)


# --------------------------------------------------------------------------
# Voxelizer (host-side, NumPy)
# --------------------------------------------------------------------------
class Voxelizer:
    """Floor-quantize + dedupe with optional augmentation
    (fusion_utils.py:81-211). Returns (voxel coords, feats, labels,
    inds_reconstruct) like the reference's voxelize()."""

    def __init__(
        self,
        voxel_size: float = 0.05,
        clip_bound=None,
        use_augmentation: bool = False,
        scale_augmentation_bound=None,  # e.g. (0.9, 1.1)
        rotation_augmentation_bound=None,  # e.g. ((-pi/64,pi/64), ...) per axis
        translation_augmentation_ratio_bound=None,
        ignore_label: int = 255,
    ):
        self.voxel_size = voxel_size
        self.clip_bound = clip_bound
        self.use_augmentation = use_augmentation
        self.scale_augmentation_bound = scale_augmentation_bound
        self.rotation_augmentation_bound = rotation_augmentation_bound
        self.translation_augmentation_ratio_bound = (
            translation_augmentation_ratio_bound
        )
        self.ignore_label = ignore_label

    def _augment_transform(self, rng: np.random.Generator) -> np.ndarray:
        T = np.eye(4)
        if self.rotation_augmentation_bound is not None:
            rot = np.eye(3)
            for axis, bound in enumerate(self.rotation_augmentation_bound):
                if bound is None:
                    continue
                theta = rng.uniform(bound[0], bound[1])
                axis_vec = np.zeros(3)
                axis_vec[axis] = 1
                rot = rot @ _axis_angle(axis_vec, theta)
            T[:3, :3] = rot
        if self.scale_augmentation_bound is not None:
            s = rng.uniform(*self.scale_augmentation_bound)
            T[:3, :3] *= s
        return T

    def voxelize(
        self,
        coords: np.ndarray,
        feats: np.ndarray,
        labels: Optional[np.ndarray] = None,
        center=None,
        seed: Optional[int] = None,
    ):
        rng = np.random.default_rng(seed)
        c = np.asarray(coords, np.float64)
        if self.use_augmentation:
            T = self._augment_transform(rng)
            c = c @ T[:3, :3].T
            if self.translation_augmentation_ratio_bound is not None:
                span = c.max(0) - c.min(0)
                for i, bound in enumerate(
                    self.translation_augmentation_ratio_bound
                ):
                    c[:, i] += rng.uniform(span[i] * bound[0], span[i] * bound[1])
        from ..io.native import voxelize_native

        # np.unique wins below ~500k points; the C++ hash map wins above
        native = (
            voxelize_native(c, self.voxel_size) if len(c) > 500_000 else None
        )
        if native is not None:
            out_coords, first_idx, inverse = native
        else:
            vox = np.floor(c / self.voxel_size).astype(np.int64)
            vox -= vox.min(0)
            # sort-based dedupe (replaces the reference's FNV-64 hashing)
            dims = vox.max(0) + 1
            lin = (vox[:, 0] * dims[1] + vox[:, 1]) * dims[2] + vox[:, 2]
            uniq, first_idx, inverse = np.unique(
                lin, return_index=True, return_inverse=True
            )
            out_coords = vox[first_idx]
        out_feats = np.asarray(feats)[first_idx]
        out_labels = (
            np.asarray(labels)[first_idx] if labels is not None else None
        )
        # inds_reconstruct: original point -> voxel row (fusion_utils ret 4)
        return out_coords, out_feats, out_labels, inverse, first_idx


def _axis_angle(axis: np.ndarray, theta: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    a = np.cos(theta / 2.0)
    b, c, d = -axis * np.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array(
        [
            [aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
            [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
            [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc],
        ]
    )
