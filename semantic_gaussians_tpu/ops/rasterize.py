"""Public differentiable rasterization API.

TPU-native replacement for the reference render()/render_chn()
(/root/reference/model/renderer.py:20-246) and the CUDA rasterizer entry
(submodules/*/__init__.py GaussianRasterizer). One function handles both RGB
(+median depth) and runtime-N-channel feature rendering.

Pipeline: project (autodiff JAX) -> bin/sort (XLA, non-diff ints) -> gather
pair columns (autodiff gather; its VJP is the deterministic segment-sum that
replaces the CUDA backward's atomicAdd scatter) -> composite (Pallas
custom_vjp, or the dense oracle) -> unscramble tile-major buffers to raster
order (autodiff handles the cotangent scramble).

Outputs are channel-last [H, W, C]; the reference's [C, H, W] convention is
converted at the torch/PLY boundary only.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .binning import TileBinning, bin_gaussians, default_pair_budget
from .composite_pallas import (
    CompositeConfig,
    composite_pairs,
    pad_pair_cols,
)
from .composite_ref import rasterize_dense
from .projection import ProjectedGaussians

# 16x32 tiles: per-pair kernel work scales with tile area (every pair's
# alpha/transmittance math runs across the whole tile), and 512 px is the
# sweet spot measured on v5e — 2x less VPU work than the r1 (8,128) tile at
# a roughly equal pair count (taller rects match isotropic splats better).
DEFAULT_TILE: Tuple[int, int] = (16, 32)


@jax.custom_vjp
def pack_gather(
    packed, pair_gaussian, tile_pos_of_gen, gen_owner, orig_to_dense, num_pairs
):
    """Tile-ordered pair columns: packed[pair_gaussian].T -> (D, P).

    Forward is the plain XLA row gather (bandwidth-bound, ~1.2 ms at P=655k).
    The hand-written VJP replaces XLA's serialized scatter-add (8.6 ms) with:
    permute cotangents to generation order (row gather), contiguous segment
    sum per depth-rank owner (Pallas one-hot-matmul kernel, ops.segsum), and
    an N-scale gather back to original ids. Deterministic by construction —
    the TPU answer to the CUDA backward's atomicAdd scatter
    (channel-rasterization backward.cu:519-549)."""
    del tile_pos_of_gen, gen_owner, orig_to_dense, num_pairs
    return packed[pair_gaussian].T


def _pack_gather_fwd(
    packed, pair_gaussian, tile_pos_of_gen, gen_owner, orig_to_dense, num_pairs
):
    out = packed[pair_gaussian].T
    return out, (
        tile_pos_of_gen, gen_owner, orig_to_dense, num_pairs, packed.shape[0]
    )


def _pack_gather_bwd(res, cot):
    import numpy as np
    from jax.dtypes import float0 as _float0
    from .segsum import CHUNK as SEG_CHUNK, segsum_contiguous

    tile_pos_of_gen, gen_owner, orig_to_dense, num_pairs, n_rows = res
    # (D, P) cotangent -> generation order along the pair axis (the pack's
    # natural transposed-SoA layout flows straight into the segsum kernel).
    cot_gen = cot[:, tile_pos_of_gen]
    d, p = cot_gen.shape
    # Invalid pairs (sentinel row in the forward) may carry NaN cotangents
    # from the composite backward's masked math; the old scatter-add
    # quarantined them in the discarded sentinel row, but the one-hot MATMUL
    # would smear 0*NaN across its whole window — zero them instead.
    valid = (jnp.arange(p, dtype=jnp.int32) < num_pairs)[None, :]
    cot_gen = jnp.where(valid, cot_gen, 0.0)
    owners = gen_owner
    pad = (-p) % SEG_CHUNK
    if pad:
        # padding cols carry owner = last owner (trash-adjacent): keep the
        # non-decreasing invariant, accumulate zeros.
        cot_gen = jnp.pad(cot_gen, ((0, 0), (0, pad)))
        owners = jnp.concatenate(
            [owners, jnp.broadcast_to(owners[-1:], (pad,))]
        )
    grad_dense = segsum_contiguous(
        cot_gen, owners, n_rows, interpret=jax.default_backend() == "cpu"
    )  # (D, n_rows) in depth-rank order
    # dense depth-rank cols -> original-id rows; sentinel (col n_rows-1 == N)
    # collects zero-pair gaussians and is returned as the sentinel row grad
    # (discarded upstream by the concat VJP).
    d_packed = grad_dense[
        :, jnp.concatenate([orig_to_dense, jnp.array([n_rows - 1], jnp.int32)])
    ].T
    f0 = lambda x: np.zeros(x.shape, _float0)
    return (
        d_packed,
        f0(tile_pos_of_gen),
        f0(tile_pos_of_gen),
        f0(gen_owner),
        f0(orig_to_dense),
        f0(num_pairs),
    )


pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)


def _pack_pair_cols(proj: ProjectedGaussians, binning: TileBinning) -> jnp.ndarray:
    """Gather per-pair splat columns [8+C, P] in sorted order (differentiable)."""
    n = proj.means2d.shape[0]
    packed = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            proj.opacities[:, None],
            proj.depths[:, None],
            jnp.zeros((n, 1), jnp.float32),
            proj.colors,
        ],
        axis=-1,
    )
    # Row n is an all-zero sentinel for invalid pairs (opacity 0 => no-op).
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[1]), packed.dtype)], axis=0
    )
    import os

    if os.environ.get("SGTPU_NO_SEGSUM"):  # A/B attribution switch: XLA
        # scatter-add VJP baseline (slow, exact-order) for parity debugging
        return packed[binning.pair_gaussian].T
    return pack_gather(
        packed,
        binning.pair_gaussian,
        binning.tile_pos_of_gen,
        binning.gen_owner,
        binning.orig_to_dense,
        binning.num_pairs,
    )


def _untile(tile_major: jnp.ndarray, cfg: CompositeConfig, h: int, w: int):
    """(num_tiles, ..., PX) tile-major -> raster [..., H, W] cropped."""
    th, tw = cfg.tile_h, cfg.tile_w
    if tile_major.ndim == 2:  # (T, PX)
        x = tile_major.reshape(cfg.grid_h, cfg.grid_w, th, tw)
        x = x.transpose(0, 2, 1, 3).reshape(cfg.grid_h * th, cfg.grid_w * tw)
        return x[:h, :w]
    # (T, C, PX)
    c = tile_major.shape[1]
    x = tile_major.reshape(cfg.grid_h, cfg.grid_w, c, th, tw)
    x = x.transpose(0, 3, 1, 4, 2).reshape(cfg.grid_h * th, cfg.grid_w * tw, c)
    return x[:h, :w]


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_width", "img_height", "tile_shape", "pair_budget", "backend",
    ),
)
def rasterize(
    proj: ProjectedGaussians,
    bg: jnp.ndarray,
    img_width: int,
    img_height: int,
    tile_shape: Tuple[int, int] = DEFAULT_TILE,
    pair_budget: Optional[int] = None,
    backend: str = "pallas",  # "pallas" | "dense"
) -> dict:
    """Rasterize projected Gaussians.

    Returns dict(render [H,W,C], depth [H,W], final_T [H,W],
    n_contrib [H,W] int32, overflow [] int32).
    """
    # Callers may pass tile_shape=None for "library default" (the pipeline
    # CLIs do); normalize before unpacking so both backends accept it.
    tile_shape = tile_shape or DEFAULT_TILE

    if backend == "dense":
        out = rasterize_dense(proj, img_width, img_height, bg, tile_shape)
        out["overflow"] = jnp.zeros((), jnp.int32)
        out["num_pairs"] = jnp.zeros((), jnp.int32)
        return out

    th, tw = tile_shape
    grid_h = -(-img_height // th)
    grid_w = -(-img_width // tw)
    n = proj.means2d.shape[0]
    budget = pair_budget or default_pair_budget(n)
    num_ch = proj.colors.shape[-1]

    binning = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, tile_shape,
        (grid_h, grid_w), budget,
    )
    cfg = CompositeConfig(
        tile_h=th,
        tile_w=tw,
        grid_h=grid_h,
        grid_w=grid_w,
        num_channels=num_ch,
        interpret=jax.default_backend() == "cpu",
    )
    pair_data = pad_pair_cols(_pack_pair_cols(proj, binning), cfg)
    color, depth, final_t, n_contrib = composite_pairs(
        cfg, pair_data, bg, binning.tile_start, binning.tile_count
    )
    return dict(
        render=_untile(color, cfg, img_height, img_width),
        depth=_untile(depth, cfg, img_height, img_width),
        final_T=_untile(final_t, cfg, img_height, img_width),
        n_contrib=_untile(n_contrib, cfg, img_height, img_width),
        overflow=binning.overflow,
        num_pairs=binning.num_pairs,
    )
