"""Pair expansion as a Pallas kernel: slot -> (tile id, gaussian id, owner).

TPU-native replacement for the XLA scatter/cummax/gather chain that turned
per-Gaussian tile counts into the flat pair list (ops.binning): the seed
scatter-max (TPU scatters serialize: 0.88 ms at P=393k), two P-scale
cummaxes, and the (P, 2) rect-table gather (0.71 ms; per-row latency-bound
like every TPU gather). This kernel keeps the depth-ordered offset/rect
table VMEM-resident (9 rows x N: 3.6 MB at N=100k) and derives everything
per 512-slot chunk from a 640-wide window of it:

  owner(p)  = #{j : offsets[j] <= p} - 1     — a (W, CHUNK) compare + count
              (the window covers the owner span: consecutive slots advance
              the owner by <= 1 — the segment-sum contiguity invariant run
              backwards; entries before the window satisfy offs <= p by
              monotonicity and are accounted by the window base);
  rect cols = one-hot(owner) contraction against the windowed table (MXU;
              exact f32 via the 3-way bf16 split, values < 2^24);
  tile id   = rect decode with the same exact-f32 divide as the XLA path.

Role parity: step 3 of the cub pipeline (duplicateWithKeys,
rasterizer_impl.cu:70-111) fused with its bookkeeping.

Round 5 adds EXACT tile-ellipse culling in the same pass at zero extra
contraction cost: the rect triple (x0, y0, w) — each < 256 for any image
up to ~8k x 4k px — is packed into ONE f32 table row (x0*65536 + y0*256
+ w < 2^24, exact), freeing rows for (mean_x, mean_y, conic/r^2) where
r^2 = 2 ln(255*opacity). A pair whose tile's minimum Mahalanobis form
exceeds r^2 (closed-form min of a PD quadratic over the tile rectangle)
has alpha < 1/255 at EVERY pixel — the composite kernel would walk it
and contribute nothing — so it is retired to the sentinel tile here,
before the tile sort, and never reaches a tile range. Output-exact by
construction (margin TIGHTCULL_MARGIN absorbs f32 rounding); measured
~10%% of live pairs at the bench configs (tools/exp_tightcull.py).

Two table residency modes (round 4, VERDICT r3 item 2 — the 12 MB ceiling
made 1M-gaussian scenes fall back to the slower XLA path):
  * resident (N <= ~330k): the whole 9-row table lives in VMEM; each chunk
    slices its 640-wide window directly.
  * streamed (any N): the table stays in HBM (`memory_space=ANY`) and each
    chunk's window is DMA'd into a double-buffered VMEM scratch — chunk
    c+1's copy is issued before chunk c computes, so the ~23 KB transfers
    hide behind the MXU contractions. Window bases come from the same
    scalar-prefetched 128-aligned anchors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
WIN = CHUNK + 128  # table window per chunk (owner span + 128-alignment)
VMEM_TABLE_BYTES = 12 * 1024 * 1024  # beyond this, stream windows from HBM
# Cull threshold slack: a tile is retired only when its continuous-rect
# minimum of q/r^2 exceeds 1 by this margin — ~1e3x any f32 rounding in
# either this test or the composite kernel's per-pixel alpha, so a culled
# tile's pixels fail alpha < 1/255 STRICTLY under both roundings.
TIGHTCULL_MARGIN = 1.0 + 1e-4


def table_fits(n: int) -> bool:
    """True -> whole-table-VMEM-resident mode; False -> streamed mode."""
    n_pad = -(-n // 128) * 128 + WIN
    return 9 * n_pad * 4 <= VMEM_TABLE_BYTES


def tile_min_qn(lox, hix, loy, hiy, e0, e1, e2):
    """Exact min over the box [lox,hix]x[loy,hiy] of the normalized PD form
    qn(d) = e0 dx^2 + 2 e1 dx dy + e2 dy^2 (e = conic / r^2).

    If the origin is inside the box the min is 0; otherwise it lies on one
    of the four edges, where the restriction is a scalar quadratic with a
    closed-form clamped minimizer. Shared op-for-op by the Pallas kernel,
    the XLA fallback, and the dense oracle so the cull DECISION is
    bit-identical across paths (it feeds the bit-compared tile streams).
    Zero rows (no cull data / non-emitting gaussians) yield qn = 0, which
    never culls."""
    inside = (lox <= 0.0) & (hix >= 0.0) & (loy <= 0.0) & (hiy >= 0.0)
    e0s = jnp.maximum(e0, 1e-20)
    e2s = jnp.maximum(e2, 1e-20)

    def q(dx, dy):
        return e0 * dx * dx + 2.0 * (e1 * dx * dy) + e2 * dy * dy

    dy1 = jnp.clip(-(e1 * lox) / e2s, loy, hiy)
    dy2 = jnp.clip(-(e1 * hix) / e2s, loy, hiy)
    dx1 = jnp.clip(-(e1 * loy) / e0s, lox, hix)
    dx2 = jnp.clip(-(e1 * hiy) / e0s, lox, hix)
    qn = jnp.minimum(
        jnp.minimum(q(lox, dy1), q(hix, dy2)),
        jnp.minimum(q(dx1, loy), q(dx2, hiy)),
    )
    return jnp.where(inside, 0.0, qn)


def _exact_dot(table_f32, onehot_bf16):
    """table (R, W) @ onehot (W, CHUNK) with exact-f32 products: 3-way bf16
    mantissa split of the table against the exactly-bf16 one-hot (see
    ops.segsum._onehot_dot for why astype round trips are NOT safe here)."""
    mask = jnp.int32(-0x10000)
    x1 = jax.lax.bitcast_convert_type(table_f32, jnp.int32) & mask
    c1 = jax.lax.bitcast_convert_type(x1, jnp.float32)
    r1 = table_f32 - c1
    x2 = jax.lax.bitcast_convert_type(r1, jnp.int32) & mask
    c2 = jax.lax.bitcast_convert_type(x2, jnp.float32)
    r2 = r1 - c2
    dims = (((1,), (0,)), ((), ()))

    def d(x):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), onehot_bf16, dims,
            preferred_element_type=jnp.float32,
        )

    return d(c1) + d(c2) + d(r2)


def _kernel(ntx: int, num_tiles: int, n: int, num_chunks: int,
            streamed: bool, tile_w: int, tile_h: int, with_cull: bool):
    def kernel(
        bases_ref,  # scalar prefetch: (C,) 128-block index of window start
        num_pairs_ref,  # scalar prefetch: (1,)
        num_dense_ref,  # scalar prefetch: (1,)
        offs_ref,  # (1, N_pad) s32: exclusive cumsum (VMEM or HBM)
        tab_ref,  # (8, N_pad) f32: packed rect, idx, offs, mx, my, e0, e1,
        # e2 (VMEM or HBM)
        tile_ref,  # OUT (1, CHUNK) s32
        gkey_ref,  # OUT (1, CHUNK) s32
        owner_ref,  # OUT (1, CHUNK) s32
        *scratch,  # streamed: offs_buf, tab_buf, sem_o, sem_t
    ):
        c = pl.program_id(0)
        base = bases_ref[c] * 128  # provably 128-aligned window start
        p = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + c * CHUNK

        if streamed:
            offs_buf, tab_buf, sem_o, sem_t = scratch

            def dmas(i, slot):
                src = bases_ref[i] * 128
                return (
                    pltpu.make_async_copy(
                        offs_ref.at[:, pl.ds(src, WIN)],
                        offs_buf.at[slot], sem_o.at[slot],
                    ),
                    pltpu.make_async_copy(
                        tab_ref.at[:, pl.ds(src, WIN)],
                        tab_buf.at[slot], sem_t.at[slot],
                    ),
                )

            slot = jax.lax.rem(c, 2)

            @pl.when(c == 0)
            def _():
                for d in dmas(0, 0):
                    d.start()

            @pl.when(c + 1 < num_chunks)
            def _():
                for d in dmas(c + 1, 1 - slot):
                    d.start()

            for d in dmas(c, slot):
                d.wait()
            offs = offs_buf[slot, 0]  # (WIN,)
            tab = tab_buf[slot]  # (8, WIN)
        else:
            offs = offs_ref[0, pl.ds(base, WIN)]  # (WIN,)
        le = (
            offs.reshape(WIN, 1) <= p
        ).astype(jnp.bfloat16)  # (WIN, CHUNK); 0/1 exact in bf16
        ones = jnp.ones((1, WIN), jnp.bfloat16)
        cnt = jax.lax.dot_general(
            ones, le, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, CHUNK); exact integer counts <= WIN
        owner_rel = cnt.astype(jnp.int32) - 1  # in [0, WIN)
        onehot = (
            owner_rel == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
        ).astype(jnp.bfloat16)

        if not streamed:
            tab = tab_ref[:, pl.ds(base, WIN)]  # (8, WIN)
        cols = _exact_dot(tab, onehot)  # (8, CHUNK) f32
        # Packed rect decode: pr = x0*65536 + y0*256 + w < 2^24, exact in
        # f32; the power-of-two divides are exact by construction.
        pr = cols[0:1]
        x0f = jnp.floor(pr / 65536.0)
        rem = pr - x0f * 65536.0
        y0f = jnp.floor(rem / 256.0)
        w = rem - y0f * 256.0
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        idx = cols[1:2].astype(jnp.int32)
        off = cols[2:3].astype(jnp.int32)

        local = (p - off).astype(jnp.float32)
        # exact f32 divide: 0 <= local < rect area, 1 <= w <= grid_w (see
        # ops.binning tile-decode note); clip guards invalid-slot garbage
        q = jnp.floor(jnp.clip(local, 0.0, float(1 << 22)) / w).astype(
            jnp.int32
        )
        lq = (p - off) - q * w.astype(jnp.int32)
        tx = x0 + lq
        ty = y0 + q
        tile = ty * ntx + tx

        valid = p < num_pairs_ref[0]
        live = valid
        if with_cull:
            # Exact tile-ellipse support test (module doc): rect bounds of
            # THIS pair's tile relative to the splat mean, in pixels.
            lox = (tx * tile_w).astype(jnp.float32) - cols[3:4]
            hix = lox + float(tile_w - 1)
            loy = (ty * tile_h).astype(jnp.float32) - cols[4:5]
            hiy = loy + float(tile_h - 1)
            qn = tile_min_qn(
                lox, hix, loy, hiy, cols[5:6], cols[6:7], cols[7:8]
            )
            live = valid & jnp.logical_not(qn > TIGHTCULL_MARGIN)
        tile_ref[...] = jnp.where(live, tile, num_tiles)
        gkey_ref[...] = jnp.where(live, idx, n)
        owner_ref[...] = jnp.where(valid, base + owner_rel, num_dense_ref[0])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "pair_budget", "ntx", "num_tiles", "n", "tile_w", "tile_h",
        "interpret",
    ),
)
def expand_pairs(
    offsets: jnp.ndarray,  # [N] s32 exclusive cumsum of per-gaussian counts,
    # clamped into [0, pair_budget+1) (depth order)
    rect_packed_d: jnp.ndarray,  # [N] s32: x0*65536 + y0*256 + w (depth
    # order; x0/y0 in tile units < 256, rect width w in [1, 256))
    idx_d: jnp.ndarray,  # [N] s32 original gaussian id
    cull_d,  # Optional (5, N) f32 (mean_x, mean_y, e0, e1, e2) depth order
    # with e = conic / r^2; None disables the tile-ellipse cull
    num_pairs: jnp.ndarray,  # [] s32 valid pairs (<= pair_budget)
    num_dense: jnp.ndarray,  # [] s32 emitting-gaussian count
    pair_budget: int,
    ntx: int,
    num_tiles: int,
    n: int,
    tile_w: int = 32,
    tile_h: int = 16,
    interpret: bool = False,
):
    """Returns (tile [P], g_key [P], gen_owner [P]) in generation order."""
    p = pair_budget
    assert p % CHUNK == 0, p
    c = p // CHUNK
    streamed = not table_fits(n)
    with_cull = cull_d is not None
    n_pad = -(-n // 128) * 128 + WIN
    # sentinel pad: offsets past N must compare ">" any slot id
    offs_pad = jnp.full((n_pad,), jnp.int32(1 << 30)).at[:n].set(offsets)
    tab = jnp.zeros((8, n_pad), jnp.float32)
    # row 0: packed rect; pad rows get w=1 to keep the in-kernel divide
    # well-defined
    tab = tab.at[0].set(1.0)
    tab = tab.at[0, :n].set(rect_packed_d.astype(jnp.float32))
    tab = tab.at[1, :n].set(idx_d.astype(jnp.float32))
    tab = tab.at[2, :n].set(offsets.astype(jnp.float32))
    if with_cull:
        tab = tab.at[3:8, :n].set(cull_d)

    # chunk-start owners (the windows' anchors): C binary searches
    starts = jnp.arange(0, p, CHUNK, dtype=jnp.int32)
    owner0 = (
        jnp.searchsorted(offsets, starts, side="right").astype(jnp.int32) - 1
    )
    bases = jnp.clip(owner0 // 128, 0, (n_pad - WIN) // 128)

    if streamed:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        scratch_shapes = [
            pltpu.VMEM((2, 1, WIN), jnp.int32),
            pltpu.VMEM((2, 8, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        in_specs = [
            pl.BlockSpec(
                (1, n_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, n_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        scratch_shapes = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, *_: (0, i)),
            pl.BlockSpec((1, CHUNK), lambda i, *_: (0, i)),
            pl.BlockSpec((1, CHUNK), lambda i, *_: (0, i)),
        ],
        scratch_shapes=scratch_shapes,
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, p), jnp.int32),
        jax.ShapeDtypeStruct((1, p), jnp.int32),
        jax.ShapeDtypeStruct((1, p), jnp.int32),
    ]
    tile, gkey, owner = pl.pallas_call(
        _kernel(ntx, num_tiles, n, c, streamed, tile_w, tile_h, with_cull),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        bases,
        num_pairs.reshape(1),
        num_dense.reshape(1),
        offs_pad.reshape(1, n_pad),
        tab,
    )
    return tile[0], gkey[0], owner[0]
