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
)
from .composite_ref import rasterize_dense
from .projection import ProjectedGaussians

# 16x32 tiles: per-pair kernel work scales with tile area (every pair's
# alpha/transmittance math runs across the whole tile), and 512 px is the
# sweet spot measured on v5e — 2x less VPU work than the r1 (8,128) tile at
# a roughly equal pair count (taller rects match isotropic splats better).
DEFAULT_TILE: Tuple[int, int] = (16, 32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pack_gather(
    num_grad_rows, packed, pair_gaussian, gen_of_tile_pos, gen_owner,
    orig_to_dense, gen_live,
):
    """Tile-ordered pair columns: packed[pair_gaussian].T -> (D, P_pad).

    Forward is the plain XLA row gather (bandwidth-bound, ~1.2 ms at P=655k);
    pair_gaussian arrives pre-padded to the composite kernel's CHUNK granule
    (sentinel rows), so the gather emits the final padded buffer directly —
    no P-scale pad copy afterwards.
    The hand-written VJP replaces XLA's serialized scatter-add (8.6 ms) with:
    permute the first `num_grad_rows` cotangent rows to generation order (the
    depth/sublane-pad rows carry no cotangent — see composite_pallas pair
    layout), contiguous segment sum per depth-rank owner (Pallas
    one-hot-matmul kernel, ops.segsum), and an N-scale gather back to
    original ids. Deterministic by construction — the TPU answer to the CUDA
    backward's atomicAdd scatter (channel-rasterization backward.cu:519-549)."""
    del gen_of_tile_pos, gen_owner, orig_to_dense, gen_live, num_grad_rows
    return packed[pair_gaussian].T


def _pack_gather_fwd(
    num_grad_rows, packed, pair_gaussian, gen_of_tile_pos, gen_owner,
    orig_to_dense, gen_live,
):
    out = packed[pair_gaussian].T
    return out, (
        gen_of_tile_pos, gen_owner, orig_to_dense, gen_live,
        packed.shape[0], pair_gaussian.shape[0],
    )


def _pack_gather_bwd(num_grad_rows, res, cot):
    import numpy as np
    from jax.dtypes import float0 as _float0
    from .segsum import CHUNK as SEG_CHUNK, segsum_contiguous

    gen_of_tile_pos, gen_owner, orig_to_dense, gen_live, n_rows, p_pad = res
    row_width = cot.shape[0]
    budget = gen_of_tile_pos.shape[0]
    # (G, P) cotangent -> generation order along the pair axis (the pack's
    # natural transposed-SoA layout flows straight into the segsum kernel).
    # Narrow channels (RGB training, the hot path): ONE multi-payload sort
    # keyed by each tile-position's generation index — TPU lane gathers are
    # per-column latency-bound (the inverse-permutation gather measured
    # 1.78 ms at P=393k vs ~0.9 ms for this sort), and dropping the inverse
    # permutation also drops the second sort that built it in binning. Only
    # the rows that carry cotangents ride along (geometry + colors; depth
    # and the sublane pad rows are zero by the composite backward's
    # construction). Wide channels (semantic feature training, C=512/768):
    # a 500+-payload variadic sort explodes XLA compile time — rebuild the
    # inverse permutation with one cheap int sort and lane-gather instead.
    if num_grad_rows <= 16:
        rows = tuple(cot[i, :budget] for i in range(num_grad_rows))
        outs = jax.lax.sort(
            (gen_of_tile_pos,) + rows, num_keys=1, is_stable=False
        )  # gen indices are unique => stability irrelevant
        cot_gen = jnp.stack(outs[1:], axis=0)
    else:
        _, tile_pos_of_gen = jax.lax.sort(
            (gen_of_tile_pos, jnp.arange(budget, dtype=jnp.int32)),
            num_keys=1,
            is_stable=False,
        )
        cot_gen = cot[:num_grad_rows, tile_pos_of_gen]
    d, p = cot_gen.shape
    # Non-live pairs — invalid slots AND tight-culled pairs — carry NaN or
    # garbage cotangents: invalid slots from the composite backward's
    # masked math, culled pairs because they sort into the tail the
    # backward never writes. Their true gradient contribution is zero
    # (culled pairs fail the alpha cutoff at every pixel), and the one-hot
    # MATMUL would smear 0*NaN across its whole window — zero them.
    cot_gen = jnp.where(gen_live[None, :], cot_gen, 0.0)
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
    # restore the zero depth/pad rows to match the primal pack width
    d_packed = jnp.pad(d_packed, ((0, 0), (0, row_width - num_grad_rows)))
    f0 = lambda shape: np.zeros(shape, _float0)
    return (
        d_packed,
        f0((p_pad,)),
        f0(gen_of_tile_pos.shape),
        f0(gen_owner.shape),
        f0(orig_to_dense.shape),
        f0(gen_live.shape),
    )


pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)


def _pack_pair_cols(
    proj: ProjectedGaussians, binning: TileBinning, cfg: CompositeConfig
) -> jnp.ndarray:
    """Gather per-pair splat columns [row_width, P_pad] in sorted order
    (differentiable). Row layout per composite_pallas module doc (gradient
    rows first, depth after colors); sublane padding and the sentinel row are
    applied at N scale and the gather indices at P scale, so the gather emits
    the kernel-ready buffer with no P-scale pad copy."""
    n = proj.means2d.shape[0]
    packed = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            proj.opacities[:, None],
            proj.colors,
            proj.depths[:, None],
        ],
        axis=-1,
    )
    # Row n is an all-zero sentinel for invalid pairs (opacity 0 => no-op);
    # column pad up to row_width satisfies Mosaic's 8-aligned sublane rule.
    packed = jnp.pad(
        packed, ((0, 1), (0, cfg.row_width - packed.shape[1]))
    )
    budget = binning.pair_gaussian.shape[0]
    pad_p = cfg.chunk + (-budget) % cfg.chunk
    idx = jnp.pad(binning.pair_gaussian, (0, pad_p), constant_values=n)
    import os

    if os.environ.get("SGTPU_NO_SEGSUM"):  # A/B attribution switch: XLA
        # scatter-add VJP baseline (slow, exact-order) for parity debugging
        return packed[idx].T
    return pack_gather(
        cfg.num_grad_rows,
        packed,
        idx,
        binning.gen_of_tile_pos,
        binning.gen_owner,
        binning.orig_to_dense,
        binning.gen_live,
    )


def _tightcull_gate(n: int, cull_ellipse):
    """Tight-cull policy: ON exactly when the pair-expand table is
    VMEM-resident (n <= ~330k) — the regime where it wins. Measured on v5e
    (bench configs, fwd+bwd): 100k gaussians 16.21 -> 15.71 ms (+3.2%
    throughput); 1M 97.7 -> 99.0 ms and 5M@1080p 710 -> 864 ms — at
    multi-M scale the cull's 5 extra N-scale depth-sort payloads cost more
    (+18 ms at 5M) than its kernel savings, because deep tiles' early-exit
    (T < 1e-4 all-done vote) already skips most of the dead tail the cull
    would remove. Env overrides for A/B: SGTPU_NO_TIGHTCULL=1 forces off,
    SGTPU_TIGHTCULL=1 forces on."""
    import os

    from .expand import table_fits

    if cull_ellipse is None or os.environ.get("SGTPU_NO_TIGHTCULL"):
        return None
    if os.environ.get("SGTPU_TIGHTCULL"):
        return cull_ellipse
    return cull_ellipse if table_fits(n) else None


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

    cull = _tightcull_gate(proj.means2d.shape[0], proj.cull_ellipse)

    if backend == "dense":
        if cull is None and proj.cull_ellipse is not None:
            import dataclasses as _dc

            proj = _dc.replace(proj, cull_ellipse=None)
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
    import os

    binning = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, tile_shape,
        (grid_h, grid_w), budget,
        cull_ellipse=cull,
    )

    cfg = CompositeConfig(
        tile_h=th,
        tile_w=tw,
        grid_h=grid_h,
        grid_w=grid_w,
        num_channels=num_ch,
        interpret=jax.default_backend() == "cpu",
        chunk=int(os.environ.get("SGTPU_COMP_CHUNK", "128")),
    )
    pair_data = _pack_pair_cols(proj, binning, cfg)
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
