"""Tiled alpha-compositing forward/backward as Pallas TPU kernels.

TPU-native re-design of renderCUDA forward
(/root/reference/submodules/rgbd-rasterization/cuda_rasterizer/forward.cu:262-393)
and the back-to-front gradient pass
(/root/reference/submodules/channel-rasterization/cuda_rasterizer/backward.cu:404-551),
with a *correct* runtime-N-channel backward (the reference's is compiled for 3
channels only — see SURVEY.md §2.1-B).

Key differences from the CUDA design (see DESIGN.md):
  * Tiles are TH x TW = 8 x 128 pixels (one native f32 VPU tile); all
    per-chunk math runs on (CHUNK=128, PX=1024) matrices — Gaussians on
    sublanes, pixels on lanes, so per-pixel loop state is compact (1, PX)
    rows (8 vregs each) and per-Gaussian reductions are sublane sums.
  * The per-pixel sequential compositing loop becomes a *vectorized chunk
    recurrence*: alphas for a CHUNK of depth-sorted Gaussians are computed at
    once, transmittance prefix/suffix products are triangular matmuls in log
    space (MXU), and color accumulation is one (C, CHUNK) x (CHUNK, PX)
    matmul (MXU) into a VMEM accumulator — no scalar loops.
  * Pair data is stored TRANSPOSED, shape (D, P): Mosaic requires HBM slices
    to be lane-aligned, so per-chunk DMA grabs (D, 128) column blocks at
    128-aligned offsets (each tile's range start is aligned down and the head
    columns masked — they belong to the previous tile), then one in-kernel
    transpose yields the (CHUNK, D) working block.
  * The backward emits per-PAIR gradient columns into the same (D, P) layout.
    Tiles own contiguous column ranges; TPU grid steps execute sequentially
    in ascending tile order, so: tail overruns (zeros past a tile's range)
    are later overwritten by the owning tile, and the 128-aligned *head*
    block — already written by the previous tile — is preserved with a
    read-merge-write on each tile's first chunk. No atomics anywhere; the
    per-Gaussian reduction is the deterministic segment-sum of the gather's
    autodiff VJP in the caller.
  * Exact reference semantics: alpha = min(0.99, op*exp(power)), skip
    power>0 / alpha<1/255, sticky termination when T*(1-alpha) < 1e-4 (that
    Gaussian excluded), median depth at the T=0.5 crossing (init 15.0),
    out = C + T*bg, and the backward's alpha gradient ignoring the 0.99
    clamp (matching CUDA backward.cu:477-530).

Pair layout (float32, shape (D, P) with D = 7 + C padded to a multiple of 8):
  row 0=mean_x 1=mean_y 2=conic_a 3=conic_b 4=conic_c 5=opacity
  6:6+C=color/feature channels  6+C=depth.
Colors sit BEFORE depth so every row with a nonzero cotangent (geometry +
colors; depth has none — reference parity, the CUDA backward has no depth
grad) is contiguous at the front: the pack-gather VJP permutes only those
6+C rows (ops.rasterize._pack_gather_bwd), cutting the cotangent lane-gather
bytes ~40% at C=3. Gradient output uses the same layout (depth/pad rows
zero).

Outputs are TILE-MAJOR: color (num_tiles, C, PX), scalars (num_tiles, 1, PX);
the caller unscrambles to raster order in XLA (outside the custom_vjp, so
cotangents scramble back automatically).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import dtypes as _jax_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CUTOFF = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
MEDIAN_DEPTH_INIT = 15.0

COL_MX, COL_MY, COL_CA, COL_CB, COL_CC, COL_OP = 0, 1, 2, 3, 4, 5
COL_COLOR = 6  # colors 6:6+C, depth at 6+C (see module doc: grad rows first)
CHUNK = 128  # DMA/alignment granule; must be a multiple of 128


class CompositeConfig(NamedTuple):
    """Static (hashable) kernel configuration."""

    tile_h: int
    tile_w: int
    grid_h: int  # number of tile rows
    grid_w: int  # number of tile cols
    num_channels: int
    interpret: bool
    # pairs streamed per DMA round; multiple of 128 (lane alignment).
    # 128 measured best at the bench config (256 halves DMA count but
    # doubles wasted head/tail work and the O(chunk^2) termination matmul).
    chunk: int = CHUNK

    @property
    def num_grad_rows(self) -> int:
        # geometry (6) + colors: every pair row that carries a cotangent.
        return COL_COLOR + self.num_channels

    @property
    def col_depth(self) -> int:
        return COL_COLOR + self.num_channels

    @property
    def row_width(self) -> int:
        # Padded to a multiple of 8: Mosaic slices along the sublane dim must
        # be 8-aligned (or full), and pair buffers are sliced by row groups.
        d = COL_COLOR + self.num_channels + 1  # + depth row
        return -(-d // 8) * 8

    @property
    def px(self) -> int:
        return self.tile_h * self.tile_w

    @property
    def num_tiles(self) -> int:
        return self.grid_h * self.grid_w


def _tri(mode: str, n: int) -> jnp.ndarray:
    """(n, n) 0/1 masks for prefix/suffix sums via LEFT-matmul:
    out[i, p] = sum_j M[i, j] * x[j, p]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # output i
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # summed j
    if mode == "prefix_excl":  # sum_{j < i}
        m = col < row
    elif mode == "suffix_excl":  # sum_{j > i}
        m = col > row
    elif mode == "suffix_incl":  # sum_{j >= i}
        m = col >= row
    else:
        raise ValueError(mode)
    return m.astype(jnp.float32)


def _dotg(a, b, dims, precision=None):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


# Value matmuls (color accumulation and its backward counterparts) run at
# HIGHEST: MXU default f32 (bf16x3) drifts ~3e-3 at the image level vs the
# sequential oracle over hundreds of composited splats.
_TRI_PRECISION = jax.lax.Precision.HIGHEST


def _cumprod_rows_excl(x: jnp.ndarray) -> jnp.ndarray:
    """EXCLUSIVE prefix product along axis 0 via masked log-step rolls.

    Mosaic has no cumsum/cumprod lowering; log-step masked rolls on the VPU
    are exact f32 (matching the sequential oracle's accuracy class) and
    cheaper than the (CHUNK, CHUNK) triangular matmul they replace."""
    rows = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < rows:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x * jnp.where(row_ids >= shift, rolled, 1.0)
        shift *= 2
    # inclusive -> exclusive: shift down one row, row 0 = 1
    return jnp.where(row_ids >= 1, pltpu.roll(x, 1, axis=0), 1.0)


def _sufprod_rows_incl(x: jnp.ndarray) -> jnp.ndarray:
    """INCLUSIVE suffix product along axis 0 (reverse masked log-step
    rolls): out[j] = prod_{i >= j} x[i]. Exact f32 multiplies — the
    backward's log/exp round trip (log1p + chunk-long cumsum + exp) cost
    ~1e-3 relative on reconstructed transmittance on TPU hardware, which
    was the entire residual means-grad parity drift. Division by these
    suffix products is safe: contribution masking terminates at
    T_EPS * MAX_ALPHA margin, so every divisor >= ~1e-6 (no underflow)."""
    rows = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < rows:
        rolled = pltpu.roll(x, rows - shift, axis=0)  # circular -shift
        x = x * jnp.where(row_ids < rows - shift, rolled, 1.0)
        shift *= 2
    return x


def _sufsum_rows_excl(x: jnp.ndarray) -> jnp.ndarray:
    """STRICT (exclusive) suffix sum along axis 0: out[j] = sum_{i > j} x[i].
    Direct reverse rolls instead of `total - prefix_incl` — the subtraction
    form loses ~ulp(total) absolute, which matters when the true suffix is
    tiny (same accuracy class the CUDA accum_rec recurrence gets by
    accumulating back-to-front, backward.cu:496-516)."""
    rows = x.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < rows:
        rolled = pltpu.roll(x, rows - shift, axis=0)
        x = x + jnp.where(row_ids < rows - shift, rolled, 0.0)
        shift *= 2
    return jnp.where(
        row_ids < rows - 1, pltpu.roll(x, rows - 1, axis=0), 0.0
    )


def _pixel_basis(cfg):
    """Tile-CENTERED pixel coordinate rows [1, x, y], shape (3, PX), with
    x/y measured from the tile's pixel centroid (so |x| <= tile_w/2)."""
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.px), 1)
    ly = (p_ids // cfg.tile_w).astype(jnp.float32) - 0.5 * (cfg.tile_h - 1)
    lx = (p_ids % cfg.tile_w).astype(jnp.float32) - 0.5 * (cfg.tile_w - 1)
    one = jnp.ones((1, cfg.px), jnp.float32)
    return jnp.concatenate([one, lx, ly], axis=0)


def _alpha_terms(bt, basis, tox, toy, cfg):
    """Shared forward/backward alpha math for one (CHUNK, D) working block.

    mx/my are re-expressed relative to the tile's pixel centroid (matching
    `_pixel_basis`); dx/dy and the exponent use the plain per-element VPU
    form (forward.cu:336-341 math) which is exact f32 — the expanded
    polynomial-basis form loses ~1e-3 to cancellation and is reserved for
    the backward's *reductions* where terms are contracted over pixels.
    """
    mx = bt[:, COL_MX : COL_MX + 1] - tox  # tile-centered
    my = bt[:, COL_MY : COL_MY + 1] - toy
    ca = bt[:, COL_CA : COL_CA + 1]
    cb = bt[:, COL_CB : COL_CB + 1]
    cc = bt[:, COL_CC : COL_CC + 1]
    op = bt[:, COL_OP : COL_OP + 1]
    depth = bt[:, cfg.col_depth : cfg.col_depth + 1]
    colors = bt[:, COL_COLOR : COL_COLOR + cfg.num_channels]  # (CHUNK, C)
    dx = mx - basis[1:2]  # (CHUNK, PX)
    dy = my - basis[2:3]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(MAX_ALPHA, op * g)
    candidate = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
    return dict(
        mx=mx, my=my, dx=dx, dy=dy, g=g, alpha=alpha, candidate=candidate,
        ca=ca, cb=cb, cc=cc, op=op, depth=depth, colors=colors,
    )


def _tile_range(tile_start_ref, tile_count_ref, chunk):
    """(aligned_start, head_skip, count, nchunks) for the current tile."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * pl.num_programs(1) + tx
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    aligned = pl.multiple_of((start // chunk) * chunk, chunk)
    head = start - aligned
    nchunks = pl.cdiv(head + count, chunk)
    return aligned, head, count, nchunks


def _ntx(cfg):
    return cfg.grid_w


def _scalar_spec(cfg):
    """Per-tile (1, PX) scalar image block; unit middle dim satisfies the
    Mosaic trailing-dims divisibility rule."""
    return pl.BlockSpec(
        (1, 1, cfg.px), lambda i, j, *_: (i * _ntx(cfg) + j, 0, 0),
        memory_space=pltpu.VMEM,
    )


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------
def _fwd_kernel(cfg: CompositeConfig):
    num_ch = cfg.num_channels
    CHUNK = cfg.chunk

    def kernel(
        tile_start_ref,
        tile_count_ref,
        pairs_hbm,  # (D, P_pad) ANY
        bg_ref,  # VMEM (C, 1)
        out_color_ref,  # (1, C, PX)
        out_depth_ref,  # (1, 1, PX)
        out_t_ref,  # (1, 1, PX)
        out_contrib_ref,  # (1, 1, PX) int32
        chunk_buf,  # VMEM (2, D, CHUNK)
        cacc_ref,  # VMEM (C, PX) accumulator
        sems,  # DMA (2,)
    ):
        aligned, head, count, nchunks = _tile_range(
            tile_start_ref, tile_count_ref, CHUNK
        )
        basis = _pixel_basis(cfg)
        tox = (pl.program_id(1) * cfg.tile_w).astype(jnp.float32) + 0.5 * (
            cfg.tile_w - 1
        )
        toy = (pl.program_id(0) * cfg.tile_h).astype(jnp.float32) + 0.5 * (
            cfg.tile_h - 1
        )
        m_pre = _tri("prefix_excl", CHUNK)
        cacc_ref[:] = jnp.zeros((num_ch, cfg.px), jnp.float32)

        def dma(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                pairs_hbm.at[:, pl.ds(aligned + k * CHUNK, CHUNK)],
                chunk_buf.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            dma(0).start()

        def cond(state):
            # Early exit once every pixel has hit its termination event —
            # T cannot drop below T_EPS without one, so this is exact
            # (renderCUDA's all-done block vote, forward.cu:314-316).
            k, T, dmed, done_f, last = state
            return (k < nchunks) & jnp.logical_not(jnp.all(done_f > 0.0))

        def body(state):
            k, T, dmed, done_f, last = state  # (1, PX) rows; done_f 0/1 f32
            done = done_f > 0.0

            # prefetch next chunk while computing this one (drained after
            # the loop if the early exit leaves it in flight)
            @pl.when(k + 1 < nchunks)
            def _():
                dma(k + 1).start()

            dma(k).wait()
            bt = chunk_buf[jax.lax.rem(k, 2)].T  # (CHUNK, D)
            a = _alpha_terms(bt, basis, tox, toy, cfg)

            # Sublane j corresponds to aligned-range index k*CHUNK + j; the
            # true range occupies [head, head + count).
            j_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + k * CHUNK
            row_valid = (j_ids >= head) & (j_ids < head + count)
            candidate = a["candidate"] & row_valid
            alpha_c = jnp.where(candidate, a["alpha"], 0.0)  # (CHUNK, PX)
            om = 1.0 - alpha_c
            # Forward-only multiplicative prefix (no log/exp round trip;
            # products only shrink, so no underflow-by-division risk).
            t_j = T * _cumprod_rows_excl(om)
            test_t = t_j * om
            terminate = candidate & (test_t < T_EPS)
            term_f = terminate.astype(jnp.float32)
            # Strict-prefix count of termination events via the MXU (default
            # precision is exact here: 0/1 values, f32 accumulation) — frees
            # ~20 VPU ops/element vs a second masked-roll cumsum.
            term_before = _dotg(m_pre, term_f, ((1,), (0,))) > 0.0
            contribute = candidate & (~terminate) & (~term_before) & (~done)
            w = jnp.where(contribute, alpha_c * t_j, 0.0)  # (CHUNK, PX)

            # (CHUNK, C)^T x (CHUNK, PX) -> (C, PX), accumulated in VMEM.
            # HIGHEST: default MXU f32 drifts ~3e-3 vs the sequential oracle
            # over hundreds of composited splats.
            cacc_ref[:] = cacc_ref[:] + _dotg(
                a["colors"], w, ((0,), (0,)), _TRI_PRECISION
            )

            hit = (contribute & (t_j > 0.5) & (test_t < 0.5)).astype(jnp.float32)
            dhit = _dotg(a["depth"], hit, ((0,), (0,)))  # (1, PX)
            anyhit = jnp.sum(hit, axis=0, keepdims=True)
            dmed = dmed * (1.0 - jnp.minimum(anyhit, 1.0)) + dhit

            # T after this chunk = test_t of the LAST contributor (test_t is
            # non-increasing along the contributor subsequence), or unchanged
            # if none contributed: a min-reduce, no multiply-reduction needed.
            T = jnp.minimum(
                T,
                jnp.min(jnp.where(contribute, test_t, 2.0), axis=0, keepdims=True),
            )
            # Carried as f32: an i1 (1, PX) loop carry fails Mosaic layout
            # legalization (roll/unroll of mask vectors).
            done_f = jnp.maximum(
                done_f, jnp.sum(terminate.astype(jnp.float32), axis=0, keepdims=True)
            )
            gidx = (j_ids - head + 1).astype(jnp.float32)  # (CHUNK, 1) 1-based
            last = jnp.maximum(
                last,
                jnp.max(jnp.where(contribute, gidx, 0.0), axis=0, keepdims=True),
            )
            return (k + 1, T, dmed, done_f, last)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.ones((1, cfg.px), jnp.float32),
            jnp.full((1, cfg.px), MEDIAN_DEPTH_INIT, jnp.float32),
            jnp.zeros((1, cfg.px), jnp.float32),
            jnp.zeros((1, cfg.px), jnp.float32),
        )
        k_final, T, dmed, _, last = jax.lax.while_loop(cond, body, init)

        # Early exit can leave the prefetch of chunk k_final in flight; the
        # semaphore must be drained before the next grid step reuses it.
        @pl.when((k_final < nchunks) & (k_final > 0))
        def _():
            dma(k_final).wait()

        out_color_ref[0] = cacc_ref[:] + bg_ref[:] * T
        out_depth_ref[0] = dmed
        out_t_ref[0] = T
        out_contrib_ref[0] = last.astype(jnp.int32)

    return kernel


def _fwd_pallas(cfg: CompositeConfig, pair_data, bg, tile_start, tile_count):
    nt = cfg.num_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.grid_h, cfg.grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pairs (D, P_pad)
            pl.BlockSpec(
                (cfg.num_channels, 1), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, cfg.num_channels, cfg.px),
                lambda i, j, *_: (i * _ntx(cfg) + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _scalar_spec(cfg),
            _scalar_spec(cfg),
            _scalar_spec(cfg),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cfg.row_width, cfg.chunk), jnp.float32),
            pltpu.VMEM((cfg.num_channels, cfg.px), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nt, cfg.num_channels, cfg.px), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, cfg.px), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, cfg.px), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, cfg.px), jnp.int32),
    ]
    color, depth, final_t, n_contrib = pl.pallas_call(
        _fwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(tile_start, tile_count, pair_data, bg.reshape(cfg.num_channels, 1))
    return color, depth[:, 0], final_t[:, 0], n_contrib[:, 0]


# --------------------------------------------------------------------------
# Backward kernel
# --------------------------------------------------------------------------
def _bwd_kernel(cfg: CompositeConfig):
    num_ch = cfg.num_channels
    CHUNK = cfg.chunk

    def kernel(
        tile_start_ref,
        tile_count_ref,
        pairs_hbm,  # (D, P_pad) ANY
        bg_ref,  # (C, 1)
        gcolor_ref,  # (1, C, PX) upstream grad, tile-major
        final_t_ref,  # (1, 1, PX)
        n_contrib_ref,  # (1, 1, PX) int32
        grads_hbm,  # OUT: (D, P_pad) ANY
        chunk_buf,  # VMEM (2, D, CHUNK)
        gbuf,  # VMEM (2, D, CHUNK) — double-buffered gradient write-out
        obuf,  # VMEM (D, CHUNK) — head merge scratch
        sems,  # DMA (2,)
        out_sems,  # DMA (2,)
        head_sem,  # DMA ()
    ):
        aligned, head, count, nchunks = _tile_range(
            tile_start_ref, tile_count_ref, CHUNK
        )
        basis = _pixel_basis(cfg)
        tox = (pl.program_id(1) * cfg.tile_w).astype(jnp.float32) + 0.5 * (
            cfg.tile_w - 1
        )
        toy = (pl.program_id(0) * cfg.tile_h).astype(jnp.float32) + 0.5 * (
            cfg.tile_h - 1
        )

        ghat = gcolor_ref[0]  # (C, PX)
        t_final = final_t_ref[0]  # (1, PX)
        n_contrib = n_contrib_ref[0].astype(jnp.float32)  # (1, PX)
        bgdot = _dotg(bg_ref[:], ghat, ((0,), (0,)), _TRI_PRECISION)  # (1, PX)

        # Chunks past the last contributor of any pixel hold no gradient:
        # walk only the active prefix, zero-fill the rest (their pair rows
        # are still valid buffer rows that must not keep garbage).
        max_contrib = jnp.max(n_contrib).astype(jnp.int32)
        active = pl.cdiv(
            jnp.minimum(head + max_contrib, head + count), CHUNK
        )

        def dma_in(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                pairs_hbm.at[:, pl.ds(aligned + k * CHUNK, CHUNK)],
                chunk_buf.at[slot],
                sems.at[slot],
            )

        @pl.when(active > 0)
        def _():
            dma_in(active - 1).start()

        def out_copy(k, slot):
            return pltpu.make_async_copy(
                gbuf.at[slot],
                grads_hbm.at[:, pl.ds(aligned + k * CHUNK, CHUNK)],
                out_sems.at[slot],
            )

        def wait_write(slot):
            # Waits the write previously started from gbuf[slot]; the dst
            # slice only sets the (identical) byte count.
            out_copy(0, slot).wait()

        def start_write(k, slot):
            """Async-DMA gbuf[slot] out to chunk k, preserving the previous
            tile's already-final head columns on chunk 0. The caller must
            wait_write(slot) before refilling gbuf[slot] — writes are
            double-buffered so compute overlaps the DMA (the old
            start-then-wait form serialized one ~us round trip per chunk,
            ~3.7k chunks/step at the bench config)."""
            @pl.when((k == 0) & (head > 0))
            def _():
                rd = pltpu.make_async_copy(
                    grads_hbm.at[:, pl.ds(aligned, CHUNK)], obuf, head_sem
                )
                rd.start()
                rd.wait()
                col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                gbuf[slot] = jnp.where(col < head, obuf[:], gbuf[slot])

            out_copy(k, slot).start()

        def drain(n_started):
            """Wait the (<= 2) still-in-flight writes of a finished loop."""
            @pl.when(n_started >= 1)
            def _():
                wait_write(jax.lax.rem(n_started - 1, 2))

            @pl.when(n_started >= 2)
            def _():
                wait_write(jax.lax.rem(n_started - 2, 2))

        # zero-fill inactive chunks [active, nchunks)
        def zero_body(k, _):
            m = k - active
            slot = jax.lax.rem(m, 2)

            @pl.when(m >= 2)
            def _():
                wait_write(slot)

            gbuf[slot] = jnp.zeros((cfg.row_width, CHUNK), jnp.float32)
            start_write(k, slot)
            return 0

        jax.lax.fori_loop(active, nchunks, zero_body, 0)
        drain(nchunks - active)

        def body(i, carry):
            # b: (1, PX) transmittance after this chunk's Gaussians.
            # s: (1, PX) sum of w*q over all LATER chunks (the cross-chunk
            #    part of CUDA's accum_rec recurrence, backward.cu:496-516).
            # (Chunks beyond `active` have no contributors, so b and s are
            # unchanged across them — starting from t_final is exact.)
            b, s = carry
            k = active - 1 - i  # active chunks walked back-to-front
            slot = jax.lax.rem(i, 2)

            @pl.when(i >= 2)
            def _():
                wait_write(slot)

            @pl.when(k > 0)
            def _():
                dma_in(k - 1).start()

            dma_in(k).wait()
            bt = chunk_buf[jax.lax.rem(k, 2)].T  # (CHUNK, D)
            a = _alpha_terms(bt, basis, tox, toy, cfg)

            j_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + k * CHUNK
            gidx0 = (j_ids - head).astype(jnp.float32)  # 0-based true index
            contribute = (
                a["candidate"] & (gidx0 >= 0.0) & (gidx0 < n_contrib)
            )  # (CHUNK, PX)
            alpha_c = jnp.where(contribute, a["alpha"], 0.0)
            om = 1.0 - alpha_c
            # T before j = b / prod_{i >= j} (1 - alpha_i): the CUDA
            # back-to-front reconstruction (backward.cu:445-455) with the
            # per-splat divisions batched into one exact suffix cumprod.
            # (A log/exp round trip here lost ~1e-3 on t_j — see
            # _sufprod_rows_incl; divisors are termination-bounded.)
            sp = _sufprod_rows_incl(om)
            t_j = b / sp
            w = alpha_c * t_j

            q = _dotg(
                a["colors"], ghat, ((1,), (0,)), _TRI_PRECISION
            )  # (CHUNK, PX)
            wq = w * q
            u = _sufsum_rows_excl(wq) + s  # strict suffix
            inv1ma = 1.0 / (1.0 - alpha_c)
            dalpha = jnp.where(
                contribute,
                t_j * q - u * inv1ma - t_final * bgdot * inv1ma,
                0.0,
            )
            # CUDA parity: alpha = op*G, 0.99 clamp ignored in backward.
            dldp = a["op"] * dalpha * a["g"]  # dL/dpower
            # All six per-pair reductions as DIRECT lane-reductions of
            # dldp against dx/dy (already live in VMEM from the alpha
            # math) — the CUDA per-thread accumulations (backward.cu:519-
            # 549) as VPU row sums. An expanded polynomial-moment form
            # (ex = mx*M0 - Mx via one k=6 MXU matmul) is ~1 ms cheaper
            # but amplifies matmul rounding by |Mx|/|ex| under
            # cancellation: measured 1.24e-3 scaled means-grad drift on
            # TPU hardware where this direct form (and CPU f32) gives
            # ~2e-6. Parity budget (<=1e-3) wins.
            dx, dy = a["dx"], a["dy"]
            t1 = dldp * dx
            t2 = dldp * dy

            def rsum(v):  # (CHUNK, PX) -> (CHUNK, 1)
                return jnp.sum(v, axis=1, keepdims=True)

            M0 = rsum(dldp)
            ex = rsum(t1)  # = sum dldp*dx
            ey = rsum(t2)
            dmx = -(a["ca"] * ex + a["cb"] * ey)
            dmy = -(a["cc"] * ey + a["cb"] * ex)
            dca = -0.5 * rsum(t1 * dx)
            dcb = -rsum(t1 * dy)
            dcc = -0.5 * rsum(t2 * dy)
            # dldp = op * (g * dalpha)  =>  sum g*dalpha = M0 / op
            dop = jnp.where(a["op"] > 0.0, M0 / jnp.maximum(a["op"], 1e-30), 0.0)
            dcolor = _dotg(w, ghat, ((1,), (1,)), _TRI_PRECISION)  # (CHUNK, C)

            # depth + sublane-pad rows carry no cotangent (zeros).
            pad = cfg.row_width - cfg.num_grad_rows
            pieces = [dmx, dmy, dca, dcb, dcc, dop, dcolor]
            if pad:
                pieces.append(jnp.zeros((CHUNK, pad), jnp.float32))
            grow = jnp.concatenate(pieces, axis=1)  # (CHUNK, D)
            gbuf[slot] = grow.T  # (D, CHUNK)
            start_write(k, slot)

            # Remove this chunk's product -> T after the previous chunk.
            b = b / sp[0:1]
            s = s + jnp.sum(wq, axis=0, keepdims=True)
            return (b, s)

        jax.lax.fori_loop(
            0, active, body, (t_final, jnp.zeros((1, cfg.px), jnp.float32))
        )
        # Drain before the grid step ends: the NEXT tile's head merge reads
        # the columns these writes produce.
        drain(active)

    return kernel


def _bwd_pallas(
    cfg: CompositeConfig, pair_data, bg, tile_start, tile_count,
    g_color, final_t, n_contrib,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.grid_h, cfg.grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pairs
            pl.BlockSpec(
                (cfg.num_channels, 1), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cfg.num_channels, cfg.px),
                lambda i, j, *_: (i * _ntx(cfg) + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _scalar_spec(cfg),
            _scalar_spec(cfg),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, cfg.row_width, cfg.chunk), jnp.float32),
            pltpu.VMEM((2, cfg.row_width, cfg.chunk), jnp.float32),
            pltpu.VMEM((cfg.row_width, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _bwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pair_data.shape, jnp.float32)],
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # wide-channel backward + HIGHEST-precision matmul scratch
            # overflows the 16M default scoped-vmem limit at C=512
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        tile_start, tile_count, pair_data,
        bg.reshape(cfg.num_channels, 1), g_color,
        final_t[:, None, :], n_contrib[:, None, :],
    )[0]


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_pairs(cfg: CompositeConfig, pair_data, bg, tile_start, tile_count):
    """Composite sorted pair columns into tile-major image buffers.

    Args:
      cfg: static CompositeConfig.
      pair_data: [D, P_pad] float32, transposed SoA layout (see module doc);
        D == cfg.row_width, P_pad a multiple of CHUNK with at least one
        zero-opacity CHUNK of padding past the last valid pair (pad_pair_cols).
      bg: [C] background color.
      tile_start / tile_count: [num_tiles] int32.

    Returns:
      (color [T, C, PX], depth [T, PX], final_T [T, PX], n_contrib int32
      [T, PX]) in tile-major order. Gradients flow to pair_data and bg;
      depth/final_T/n_contrib cotangents are ignored (reference parity: the
      CUDA backward has no depth grad).
    """
    return tuple(_fwd_pallas(cfg, pair_data, bg, tile_start, tile_count))


def _composite_fwd(cfg, pair_data, bg, tile_start, tile_count):
    color, depth, final_t, n_contrib = _fwd_pallas(
        cfg, pair_data, bg, tile_start, tile_count
    )
    res = (pair_data, bg, tile_start, tile_count, final_t, n_contrib)
    return (color, depth, final_t, n_contrib), res


def _composite_bwd(cfg, res, cts):
    pair_data, bg, tile_start, tile_count, final_t, n_contrib = res
    g_color = cts[0]
    d_pairs = _bwd_pallas(
        cfg, pair_data, bg, tile_start, tile_count, g_color, final_t, n_contrib
    )
    # bg only enters as out = C + T*bg  =>  d_bg[c] = sum_px T_final * g[t,c,px]
    d_bg = jnp.einsum("tp,tcp->c", final_t, g_color)
    f0 = lambda x: np.zeros(x.shape, _jax_dtypes.float0)
    return d_pairs, d_bg, f0(tile_start), f0(tile_count)


composite_pairs.defvjp(_composite_fwd, _composite_bwd)


def pad_pair_cols(pair_data: jnp.ndarray, cfg: CompositeConfig) -> jnp.ndarray:
    """Pad a raw (7+C, P) pair buffer (geometry+colors+depth rows): D up to
    cfg.row_width (8-aligned sublanes) and P by one extra CHUNK so chunked
    DMA never reads out of bounds. The production path emits a pre-padded
    buffer straight from the pack gather (ops.rasterize._pack_pair_cols);
    this helper remains for hand-built buffers (tools/microbenches)."""
    d, p = pair_data.shape
    pad_p = cfg.chunk + (-p) % cfg.chunk
    return jnp.pad(pair_data, ((0, cfg.row_width - d), (0, pad_p)))
