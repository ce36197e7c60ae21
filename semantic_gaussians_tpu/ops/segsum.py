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


def _kernel(bases_ref, owners_ref, cot_ref, zero_ref, out_ref, acc, sem_in, sem_out):
    del zero_ref  # aliased to out_ref; only its buffer is used
    c = pl.program_id(0)
    # bases are stored as 128-element block indices: multiplying here makes
    # the lane alignment PROVABLE to Mosaic (a raw value, even if aligned,
    # fails its divisibility check).
    base = bases_ref[c] * 128

    # read-modify-write window [base, base + WIN) along the segment axis
    read = pltpu.make_async_copy(
        out_ref.at[:, pl.ds(base, WIN)], acc, sem_in
    )
    read.start()
    read.wait()

    col = owners_ref[...] - base  # (1, CH), in [0, WIN) by contiguity
    onehot_t = (
        col == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
    ).astype(jnp.float32)  # (WIN, CH): [j, i] = owner_i == base + j
    partial = jax.lax.dot_general(
        cot_ref[...],
        onehot_t,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # The one-hot side is exact in bf16, but the COTANGENT side is not:
        # MXU-default bf16x3 keeps only ~16 of its 24 mantissa bits, and the
        # lost low bits compounded to 6.6e-3 scaled grad drift on hardware
        # (render parity was 6.6e-7; CPU interpret mode exact). HIGHEST
        # restores full f32 products; D is tiny so the cost is sub-ms.
        precision=jax.lax.Precision.HIGHEST,
    )  # (D, WIN)
    acc[...] = acc[...] + partial

    write = pltpu.make_async_copy(
        acc, out_ref.at[:, pl.ds(base, WIN)], sem_out
    )
    write.start()
    write.wait()


@functools.partial(jax.jit, static_argnames=("num_rows", "interpret"))
def segsum_contiguous(
    cot: jnp.ndarray,  # [D, P] float32, P a multiple of CHUNK
    owners: jnp.ndarray,  # [P] int32, non-decreasing, steps of <= 1
    num_rows: int,  # output segments (max owner id + 1 allowed)
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, g] = sum of cot columns with owners == g; shape [D, num_rows]."""
    d, p = cot.shape
    assert p % CHUNK == 0, p
    c = p // CHUNK
    d_pad = (-d) % 8  # DMA slices need 8-aligned (or full) sublane extents
    if d_pad:
        cot = jnp.pad(cot, ((0, d_pad), (0, 0)))
        d += d_pad
    cols_pad = -(-num_rows // 128) * 128 + WIN  # headroom for the last window
    bases = jnp.clip(owners[::CHUNK] // 128, 0, (cols_pad - WIN) // 128)
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
            pltpu.VMEM((d, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, cols_pad), jnp.float32),
        input_output_aliases={3: 0},  # zeros buffer -> output (RMW init)
        interpret=interpret,
    )(bases, owners.reshape(1, p), cot, zeros)
    return out[: d - d_pad if d_pad else d, :num_rows]
