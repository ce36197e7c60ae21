"""Contiguous segment-sum Pallas kernel: the pack-gather VJP's reduction.

Replaces XLA's scatter-add lowering of `zeros.at[ids].add(cot)` (serialized
per-row: measured 8.6 ms at P=655k, D=11 on v5e) for the special case this
pipeline guarantees: segment ids are NON-DECREASING and increment by at most
1 between neighbours (generation-order pair owners, ops.binning.TileBinning
.gen_owner). Then any CH consecutive pairs touch < CH + 1 consecutive output
segments, so each grid step reduces its chunk with one one-hot contraction on
the MXU and accumulates into a W-column output window via read-modify-write
DMA (TPU grid steps run sequentially, so overlapping windows are race-free).

Everything lives in the pack's natural (D, P) transposed-SoA layout (see
composite_pallas module doc): pairs on LANES. Lane-dim DMA slices must be
128-aligned, hence W = CHUNK + 128 window columns at 128-aligned bases.

The one-hot operand is exact 0/1 even in bf16, but the cotangent operand is
NOT — the contraction runs at Precision.HIGHEST (see kernel) to keep full
f32 products; accumulation order differs from XLA's scatter but stays plain
f32 summation (same tolerance class).

Role parity: this is the deterministic replacement for the CUDA backward's
atomicAdd gradient scatter (/root/reference/submodules/channel-rasterization/
cuda_rasterizer/backward.cu:519-549).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
WIN = CHUNK + 128  # output window columns per chunk
# VMEM budget for the whole-accumulator fast path; beyond it the rolling-
# panel kernel handles multi-M-gaussian scenes and wide-channel (C=512/768)
# backward passes. Module-level so tests can force the fallback.
VMEM_ACC_BYTES = 12 * 1024 * 1024
PANEL = 4096  # rolling-panel columns (multiple of 128)
STRIDE = PANEL - WIN  # flush granularity; >= CHUNK so one slide/chunk suffices


def _onehot_dot(cot, onehot_t):
    """Exact-f32 cot @ onehot_t.T at HALF of Precision.HIGHEST's cost.

    The one-hot operand is exactly representable in bf16 (0/1), but the
    cotangent is not: plain bf16 products lost ~8 mantissa bits and
    compounded to 6.6e-3 scaled grad drift on hardware (render parity was
    6.6e-7). HIGHEST restores exactness by splitting BOTH operands into 3
    bf16 components (6 MXU passes) — wasteful when one side is already
    exact. Manual 3-way split of the cotangent alone (top-16-bit
    truncations peel 8+8+8 mantissa bits, reconstructing all 24) against
    the exact bf16 one-hot gives exact f32 products in 3 single-pass bf16
    matmuls with f32 accumulation.

    The components are built with integer mantissa masks, NOT
    astype(bf16)/astype(f32) round trips: XLA's algebraic simplifier
    cancels convert(convert(x, bf16), f32) pairs feeding a dot, which
    silently collapses the split back to one bf16 product (observed 6.5e-2
    error on TPU). Bit masking is opaque to that pass, and each masked
    value fits bf16 exactly, so the narrowing converts below are lossless."""
    mask = jnp.int32(-0x10000)  # keep sign+exp+top-7 mantissa bits
    x1 = jax.lax.bitcast_convert_type(cot, jnp.int32) & mask
    c1 = jax.lax.bitcast_convert_type(x1, jnp.float32)
    r1 = cot - c1  # exact: |r1| < ulp_bf16(cot), shared exponent range
    x2 = jax.lax.bitcast_convert_type(r1, jnp.int32) & mask
    c2 = jax.lax.bitcast_convert_type(x2, jnp.float32)
    r2 = r1 - c2  # exact; holds the final <= 8 mantissa bits
    dims = (((1,), (1,)), ((), ()))

    def d(x):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), onehot_t, dims,
            preferred_element_type=jnp.float32,
        )

    return d(c1) + d(c2) + d(r2)


def _kernel_vmem(bases_ref, owners_ref, cot_ref, out_ref):
    """Whole accumulator resident in VMEM: no per-step DMA at all.

    When the full (D, num_rows) accumulator fits in VMEM, the output block
    (constant index map => it
    stays VMEM-resident across the whole grid and is flushed once at the
    end) IS the accumulator: the window update is a register-level
    dynamic-slice add and the cotangent stream is auto-pipelined by the
    grid; the kernel becomes MXU/VPU-bound (~0.3 ms)."""
    acc = out_ref
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    base = bases_ref[c] * 128  # provably 128-aligned (block index * 128)
    col = owners_ref[...] - base  # (1, CH), in [0, WIN) by contiguity
    onehot_t = (
        col == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
    ).astype(jnp.bfloat16)  # (WIN, CH): [j, i] = owner_i == base + j
    partial = _onehot_dot(cot_ref[...], onehot_t)  # (D, WIN)
    acc[:, pl.ds(base, WIN)] = acc[:, pl.ds(base, WIN)] + partial


def _kernel_panel(
    scalars_ref, owners_ref, cot_ref, zero_ref, out_ref, acc,
    sem_flush, sem_final,
):
    """Rolling-panel accumulator: resident-path arithmetic at any num_rows.

    The previous fallback round-tripped a (D, WIN) read-modify-write DMA
    through HBM per 512-pair chunk — two serialized latency-bound DMAs per
    chunk (measured 11.2 ms of the 110 ms 1M-gaussian bench step; it also
    ruled EVERY wide-channel backward, where D*num_rows never fits VMEM).
    Owners are non-decreasing, so the active output window only advances:
    keep a PANEL-column VMEM accumulator, add each chunk's one-hot partial
    at a dynamic offset, and when the next window would cross the panel's
    right edge, flush the leading STRIDE columns to HBM once (they are
    final — later windows start strictly above them), shift the WIN-column
    tail down, advance. Total flushes ~ num_rows/STRIDE for the whole grid
    instead of 2 DMAs per chunk.

    The per-chunk panel base is PRECOMPUTED in XLA and scalar-prefetched
    (scalars_ref row 0 = window base block, row 1 = panel base block): a
    first version tracked the panel base in SMEM inside the kernel, and the
    compute-stream SMEM write feeding the next chunk's addressing forced a
    scalar-core sync per chunk — 625 ms at the 1M config, 56x WORSE than
    the RMW kernel it replaced. With prefetched bases the scalar core runs
    ahead exactly as in _kernel_vmem. Blocks are 128-element units so lane
    alignment stays PROVABLE to Mosaic (a raw value fails its check).
    """
    del zero_ref  # aliased to out_ref; only its buffer is used
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    base = scalars_ref[0, c] * 128
    pb_blk = scalars_ref[1, c]

    # Slide: pb advances by exactly STRIDE//128 blocks when it moves (owners
    # step <= 1 => the window base advances <= CHUNK < STRIDE per chunk).
    @pl.when((c > 0) & (pb_blk != scalars_ref[1, jnp.maximum(c - 1, 0)]))
    def _():
        old_pb = (pb_blk - STRIDE // 128) * 128
        flush = pltpu.make_async_copy(
            acc.at[:, pl.ds(0, STRIDE)],
            out_ref.at[:, pl.ds(old_pb, STRIDE)],
            sem_flush,
        )
        flush.start()
        flush.wait()
        acc[:, 0:WIN] = acc[:, STRIDE:PANEL]
        acc[:, WIN:PANEL] = jnp.zeros_like(acc[:, WIN:PANEL])

    off = (scalars_ref[0, c] - pb_blk) * 128  # window offset inside panel
    col = owners_ref[...] - base  # (1, CH), in [0, WIN) by contiguity
    onehot_t = (
        col == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
    ).astype(jnp.bfloat16)  # (WIN, CH): [j, i] = owner_i == base + j
    partial = _onehot_dot(cot_ref[...], onehot_t)  # (D, WIN)
    acc[:, pl.ds(off, WIN)] = acc[:, pl.ds(off, WIN)] + partial

    @pl.when(c == nc - 1)
    def _():
        final = pltpu.make_async_copy(
            acc, out_ref.at[:, pl.ds(pb_blk * 128, PANEL)], sem_final
        )
        final.start()
        final.wait()


@functools.partial(jax.jit, static_argnames=("num_rows", "interpret"))
def segsum_contiguous(
    cot: jnp.ndarray,  # [D, P] float32, P a multiple of CHUNK
    owners: jnp.ndarray,  # [P] int32, non-decreasing, steps of <= 1
    num_rows: int,  # output segments (max owner id + 1 allowed)
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, g] = sum of cot columns with owners == g; shape [D, num_rows].

    The "steps of <= 1" contract is LOAD-BEARING for the rolling-panel
    path, not just an optimization hint: the panel slide assumes the panel
    base advances by exactly one STRIDE per move (possible only when the
    window base moves <= CHUNK < STRIDE per chunk). An owners stream that
    jumps by more than CHUNK across a chunk boundary would make the kernel
    flush a whole STRIDE of accumulated columns to the WRONG output rows —
    silent corruption, not dropped terms. Current callers (expand.py pair
    owners, binning.py ranges) satisfy the invariant by construction,
    including overflow/padding tails.
    """
    d, p = cot.shape
    assert p % CHUNK == 0, p
    c = p // CHUNK
    d_pad = (-d) % 8  # DMA slices need 8-aligned (or full) sublane extents
    if d_pad:
        cot = jnp.pad(cot, ((0, d_pad), (0, 0)))
        d += d_pad
    # Whole-accumulator-in-VMEM fast path (see _kernel_vmem). The budget
    # leaves generous room for the pipelined input blocks; beyond it
    # (multi-M gaussian scenes, wide-channel backward) the rolling-panel
    # kernel takes over.
    cols_pad = -(-num_rows // 128) * 128 + WIN  # headroom for the last window
    if d * cols_pad * 4 <= VMEM_ACC_BYTES:
        bases = jnp.clip(owners[::CHUNK] // 128, 0, (cols_pad - WIN) // 128)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda i, bases: (0, i)),
                pl.BlockSpec((d, CHUNK), lambda i, bases: (0, i)),
            ],
            out_specs=pl.BlockSpec(
                (d, cols_pad), lambda i, bases: (0, 0)
            ),
        )
        out = pl.pallas_call(
            _kernel_vmem,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((d, cols_pad), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(bases, owners.reshape(1, p), cot)
        return out[: d - d_pad if d_pad else d, :num_rows]

    # Rolling panel: final-flush headroom of a full PANEL past the last
    # owner block; the clip keeps every flush inside the padded buffer.
    cols_pad = -(-num_rows // 128) * 128 + PANEL
    base_blk = jnp.clip(owners[::CHUNK] // 128, 0, (cols_pad - PANEL) // 128)
    # Per-chunk panel base, STRIDE-quantized ceil of (window end - PANEL):
    # non-decreasing with base_blk, advances by exactly STRIDE//128 blocks
    # per move (window base moves <= CHUNK < STRIDE per chunk), and keeps
    # 0 <= base - pb <= STRIDE so the window sits inside the panel.
    blk_w, blk_p, blk_s = WIN // 128, PANEL // 128, STRIDE // 128
    need = base_blk + blk_w - blk_p
    pb_blk = jnp.maximum(0, -((-need) // blk_s)) * blk_s
    scalars = jnp.stack([base_blk, pb_blk]).astype(jnp.int32)
    zeros = jnp.zeros((d, cols_pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, bases: (0, i)),
            pl.BlockSpec((d, CHUNK), lambda i, bases: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d, PANEL), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel_panel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, cols_pad), jnp.float32),
        input_output_aliases={3: 0},  # zeros -> output (untouched cols stay 0)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(scalars, owners.reshape(1, p), cot, zeros)
    return out[: d - d_pad if d_pad else d, :num_rows]
