"""Tile binning: duplicate-by-tile, depth sort, tile ranges — all in XLA.

TPU-native replacement for the cub pipeline in
/root/reference/submodules/rgbd-rasterization/cuda_rasterizer/rasterizer_impl.cu:198-341
(InclusiveSum → duplicateWithKeys → DeviceRadixSort → identifyTileRanges).
Differences by design:
  * static PAIR_BUDGET instead of a host-synced `num_rendered`
    (rasterizer_impl.cu:283 does a cudaMemcpy to host; we never leave device);
    overflow is counted and reported, not silently corrupted.
  * pair expansion via searchsorted over the count cumsum (one gather instead
    of a scatter with variable fan-out),
  * lexicographic `lax.sort` on (tile_id, depth) instead of packed 64-bit radix
    keys,
  * per-tile [start, count) via two searchsorted calls.

Everything here is integer bookkeeping — non-differentiable by nature (the
reference treats it the same way); gradients flow through the gathered splat
values, not the ordering.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp



@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBinning:
    """Sorted (tile, depth) pair list + per-tile ranges.

    The gen_* / *_dense fields support the pack gather's hand-written VJP
    (ops.rasterize.pack_gather): "generation order" is the pre-tile-sort
    order, where each Gaussian's pairs are CONTIGUOUS (grouped by depth
    rank), so the per-Gaussian gradient reduction is a contiguous segment
    sum (Pallas one-hot-matmul kernel) instead of XLA's serialized
    scatter-add (measured 8.6 ms at P=655k)."""

    pair_gaussian: jnp.ndarray  # [PAIR_BUDGET] int32 gaussian index (N = invalid)
    pair_tile: jnp.ndarray  # [PAIR_BUDGET] int32 tile id (num_tiles = invalid)
    tile_start: jnp.ndarray  # [num_tiles] int32 start row per tile
    tile_count: jnp.ndarray  # [num_tiles] int32 rows per tile
    num_pairs: jnp.ndarray  # [] int32 valid pairs (pre-clip)
    overflow: jnp.ndarray  # [] int32 pairs dropped due to budget
    gen_of_tile_pos: jnp.ndarray  # [PAIR_BUDGET] int32: generation-order
    # index of the pair at tile-order position p (the tile sort's
    # permutation). The pack-gather VJP re-sorts cotangent columns by this
    # key to reach generation order — a multi-payload sort beats the lane
    # gather of the inverse permutation (per-column latency-bound, 1.78 ms
    # at P=393k) and the second sort that built it.
    gen_owner: jnp.ndarray  # [PAIR_BUDGET] int32: DENSE owner rank of
    # generation-order pair i — consecutive over pair-emitting gaussians in
    # depth order; overflow/invalid slots own the trash rank num_dense.
    # Non-decreasing, increments by <= 1 between neighbours.
    orig_to_dense: jnp.ndarray  # [N] int32: original gaussian id -> dense
    # rank (pair-emitting gaussians) or N (sentinel row, zero gradient).
    gen_live: jnp.ndarray  # [PAIR_BUDGET] bool, GENERATION order: pair is
    # inside some tile range (valid AND not tight-culled). The pack-gather
    # VJP zeroes the cotangents of non-live pairs — tight-culled pairs sit
    # in the sorted tail where the composite backward never writes, so
    # their tile-order cotangent columns are garbage, and their true
    # gradient contribution is zero (every pixel fails the alpha cutoff).


def tile_rects(
    means2d: jnp.ndarray,
    radii_xy: jnp.ndarray,  # [N, 2] per-axis half-extents (0 = culled)
    tile_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
):
    """Per-Gaussian touched tile rectangle — getRect (auxiliary.h:46-56) with
    per-axis extents (see projection.py radii_xy: output-identical, fewer
    pairs than the reference's circular radius)."""
    th, tw = tile_shape
    nty, ntx = grid_shape
    rx = radii_xy[:, 0].astype(jnp.float32)
    ry = radii_xy[:, 1].astype(jnp.float32)
    x, y = means2d[:, 0], means2d[:, 1]
    x0 = jnp.clip(jnp.floor((x - rx) / tw), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + rx + tw - 1) / tw), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - ry) / th), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + ry + th - 1) / th), 0, nty).astype(jnp.int32)
    counts = jnp.where(
        (radii_xy[:, 0] > 0) & (radii_xy[:, 1] > 0),
        (x1 - x0) * (y1 - y0),
        0,
    )
    return x0, x1, y0, y1, counts


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "grid_shape", "pair_budget")
)
def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii_xy: jnp.ndarray,  # [N, 2] per-axis rect half-extents
    tile_shape: Tuple[int, int],
    grid_shape: Tuple[int, int],
    pair_budget: int,
    cull_ellipse: jnp.ndarray = None,  # [N, 3] conic / r^2 (r^2 =
    # 2 ln(255*opacity), projection.py): enables the exact tile-ellipse
    # cull — pairs whose tile lies wholly outside the splat's alpha >=
    # 1/255 support are retired to the sentinel tile (output-exact;
    # ~10% of live pairs at the bench configs). None disables.
) -> TileBinning:
    n = means2d.shape[0]
    nty, ntx = grid_shape
    num_tiles = nty * ntx
    # Rect triples ride the depth sort bit-packed (one payload, and the
    # pair-expand kernel's one f32 table row): x0/y0/w each < 256 bounds
    # the grid at 255x255 tiles — 8160x4080 px at the default (16, 32).
    assert ntx < 256 and nty < 256, (
        f"grid {grid_shape} exceeds the 255x255-tile packed-rect bound"
    )

    # Pre-sort Gaussians by depth ONCE (N elements), emit pairs in depth
    # order, then a SINGLE-KEY STABLE sort by tile id gives per-tile
    # depth-ordered lists — much cheaper than a 2-key lexicographic sort of
    # the full pair list (the cub radix-sort analogue, rasterizer_impl.cu:302).
    x0, x1, y0, y1, counts = tile_rects(
        means2d, radii_xy, tile_shape, grid_shape
    )
    # Multi-payload sort carries the rect data INTO depth order directly:
    # argsort + five `x[depth_order]` gathers run on the TPU scalar core at
    # ~3.7ms each; one variadic sort is ~1ms total.
    depth_key = jnp.where(counts > 0, depths, jnp.inf)
    rect_packed = (x0 << 16) | (y0 << 8) | jnp.maximum(x1 - x0, 1)
    cull_cols = ()
    if cull_ellipse is not None:
        # The cull is a discrete keep/drop decision — non-differentiable
        # bookkeeping like every other int here (and the pair-expand kernel
        # has no JVP rule); kept pairs' gradients flow through the gathered
        # splat values, dropped pairs' true gradient is zero.
        cull_cols = tuple(
            jax.lax.stop_gradient(c)
            for c in (
                means2d[:, 0], means2d[:, 1],
                cull_ellipse[:, 0], cull_ellipse[:, 1], cull_ellipse[:, 2],
            )
        )
    sorted_cols = jax.lax.sort(
        (
            depth_key,
            counts,
            rect_packed,
            jnp.arange(n, dtype=jnp.int32),
        ) + cull_cols,
        num_keys=1,
        is_stable=True,
    )
    _, counts_d, pr_d, idx_d = sorted_cols[:4]
    cull_d = (
        jnp.stack(sorted_cols[4:9], axis=0) if cull_ellipse is not None
        else None
    )
    # Prefix-sum in f32, not i32: a divergent phase can touch >2^31 pairs
    # (1M gaussians x full grid), and a wrapped i32 cumsum corrupts BOTH the
    # overflow signal (total<0 -> overflow=0, silent empty render) and the
    # seed scatter below (negative offsets index numpy-style from the END
    # of the seed array). f32 partial sums are exact below 2^24 — every
    # offset that matters (< pair_budget, asserted) — and stay monotone
    # >= 2^24 beyond, so clamping to the budget is always correct. The
    # overflow COUNT is approximate past 2^24 dropped pairs (a signal, not
    # bookkeeping).
    assert pair_budget < (1 << 24), "pair budget exceeds f32-exact range"
    cumf = jnp.cumsum(counts_d.astype(jnp.float32))  # inclusive
    total = jnp.minimum(cumf[-1], 2.0**31 - 128).astype(jnp.int32)
    offsets = jnp.minimum(cumf - counts_d, pair_budget + 1).astype(
        jnp.int32
    )  # exclusive, clamped into [0, budget+1)

    pair_idx = jnp.arange(pair_budget, dtype=jnp.int32)
    num_pairs = jnp.minimum(total, pair_budget)
    # Dense owner ranks over pair-emitting gaussians: zero-count gaussians
    # sort to the END of the depth order (depth_key = inf), so the emitting
    # gaussians occupy depth ranks [0, num_dense) — their depth rank IS the
    # dense rank, and generation-order owners are consecutive: the
    # contiguity invariant the segment-sum kernel's one-hot window relies on
    # (owner span of any K consecutive pairs < K + 1).
    nonzero = counts_d > 0
    num_dense = jnp.sum(nonzero.astype(jnp.int32))

    import os

    from .expand import expand_pairs

    use_kernel = (
        pair_budget % 512 == 0
        and not os.environ.get("SGTPU_NO_EXPAND")
    )
    if use_kernel:
        # Pallas pair-expand kernel (ops.expand): owner ids by in-window
        # compare+count, rect columns by one-hot MXU contraction — replaces
        # the serialized seed scatter-max (0.88 ms at P=393k), two P-scale
        # cummaxes, and the per-row-latency-bound (P, 2) table gather
        # (0.71 ms) below. Above ~330k gaussians the kernel streams its
        # table windows from HBM (double-buffered DMA) instead of holding
        # the table VMEM-resident — no size ceiling (r3 fell back to the
        # XLA path there). The exact tile-ellipse cull runs in the same
        # pass when cull_ellipse is given (see ops.expand module doc).
        th_px, tw_px = tile_shape
        tile, g_key, gen_owner = expand_pairs(
            offsets, pr_d, idx_d, cull_d, num_pairs, num_dense,
            pair_budget, ntx, num_tiles, n,
            tile_w=tw_px, tile_h=th_px,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        # XLA fallback (non-granular budgets / SGTPU_NO_EXPAND): depth-
        # ranked owner of each pair slot via scatter-max + running max —
        # equivalent to searchsorted(cum, p, 'right') but cheaper than
        # sorting budget+n keys (scan-searchsorted costs ~200ms;
        # sort-searchsorted lands extra scalar-core fusions).
        seed = (
            jnp.full((pair_budget + 1,), -1, jnp.int32)
            .at[jnp.minimum(offsets, pair_budget)]
            .max(jnp.arange(n, dtype=jnp.int32))[:pair_budget]
        )
        g = jax.lax.cummax(seed)
        valid = pair_idx < num_pairs
        g_safe = jnp.clip(g, 0, n - 1)
        # Pair-slot owner offsets WITHOUT a gather: offsets are
        # non-decreasing in depth order, and seed >= 0 exactly at
        # range-start positions, so the same cummax trick recovers the
        # owner's start index from the slot index itself.
        off_col = jax.lax.cummax(jnp.where(seed >= 0, pair_idx, -1))
        x0d = pr_d >> 16
        y0d = (pr_d >> 8) & 255
        wd = pr_d & 255
        rows = jnp.stack([x0d, y0d, wd, idx_d], axis=-1)[g_safe]  # [P, 4]
        x0p, y0p, w = rows[:, 0], rows[:, 1], rows[:, 2]
        local = pair_idx - off_col
        # local // w and local % w via f32: s32 divide has no VPU lowering
        # (the int version measured 2.4 ms serialized at P=655k). Exact
        # because 0 <= local < rect area (<= ~2k) and 1 <= w <= grid_w:
        # both far inside f32's exact-integer range, and correctly-rounded
        # f32 divide cannot cross an integer boundary when the spacing
        # 1/w >> ulp(local/w). Clamp first: overflow slots carry garbage
        # (masked out below).
        local_f = jnp.clip(local, 0, 1 << 22).astype(jnp.float32)
        q = jnp.floor(local_f / w.astype(jnp.float32)).astype(jnp.int32)
        tx = x0p + (local - q * w)
        ty = y0p + q
        live = valid
        if cull_d is not None:
            from .expand import TIGHTCULL_MARGIN, tile_min_qn

            th_px, tw_px = tile_shape
            cp = cull_d[:, g_safe]  # (5, P)
            lox = (tx * tw_px).astype(jnp.float32) - cp[0]
            hix = lox + float(tw_px - 1)
            loy = (ty * th_px).astype(jnp.float32) - cp[1]
            hiy = loy + float(th_px - 1)
            qn = tile_min_qn(lox, hix, loy, hiy, cp[2], cp[3], cp[4])
            live = valid & jnp.logical_not(qn > TIGHTCULL_MARGIN)
        tile = jnp.where(live, ty * ntx + tx, num_tiles)
        g_key = jnp.where(live, rows[:, 3], n)
        gen_owner = jnp.where(valid, g_safe, num_dense)
    # original id -> dense rank (or N for zero-pair gaussians: sentinel row).
    # idx_d is a permutation, so its inverse comes from a second N-scale
    # sort — ~2x cheaper than the unique-index scatter it replaces (TPU
    # scatters serialize; the depth sort at the same N measures 0.26 ms vs
    # 0.59 ms for the scatter form at N=100k).
    _, orig_to_dense = jax.lax.sort(
        (idx_d, jnp.where(nonzero, jnp.arange(n, dtype=jnp.int32), n)),
        num_keys=1,
        is_stable=False,
    )

    sorted_tile, sorted_g, sorted_gen = jax.lax.sort(
        (tile, g_key, pair_idx), num_keys=1, is_stable=True
    )

    # Per-tile ranges: few queries -> the scan-based searchsorted is cheap;
    # method="sort" here would re-sort the whole pair list (~10ms).
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(
        jnp.int32
    )
    return TileBinning(
        pair_gaussian=sorted_g,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=jnp.minimum(total, pair_budget).astype(jnp.int32),
        overflow=jnp.maximum(total - pair_budget, 0).astype(jnp.int32),
        gen_of_tile_pos=sorted_gen,
        gen_owner=gen_owner,
        orig_to_dense=orig_to_dense,
        gen_live=tile < num_tiles,
    )


def band_pair_budget(capacity: int, nband: int) -> int:
    """Per-band static budget: 2x headroom over the even 1/nband split of
    the full-image budget (clustered splats would overflow an even split),
    ceiled to 8k granules."""
    per_band = -(-default_pair_budget(capacity) * 2 // nband)
    return max(8192, -(-per_band // 8192) * 8192)


def default_pair_budget(n: int, avg_tiles_per_gaussian: int = 12) -> int:
    """Heuristic static budget, rounded to 8k granules to bound recompiles."""
    b = n * avg_tiles_per_gaussian
    return max(8192, -(-b // 8192) * 8192)
