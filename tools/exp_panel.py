"""Bisect the rolling-panel segsum slowdown (573 ms vs 11.2 ms RMW at the
1M config). Variants isolate: conditional DMA, dynamic window offset,
panel width, and the plain resident path at the SAME chunk count."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import semantic_gaussians_tpu.ops.segsum as sg

    d, p, rows = 16, 3_670_016, 1_000_000
    rng = np.random.default_rng(0)
    cot = jnp.asarray(rng.normal(size=(d, p)).astype(np.float32))
    steps = (rng.uniform(size=p) < rows / p * 0.95).astype(np.int32)
    steps[0] = 0
    owners_np = np.minimum(np.cumsum(steps), rows - 1).astype(np.int32)
    owners = jnp.asarray(owners_np)

    def timeit(label, fn, *a):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")
        return out

    # V4: resident path at the same chunk count (rows=50k fits VMEM)
    small = jnp.asarray(np.minimum(owners_np, 49_999))
    f_res = functools.partial(
        sg.segsum_contiguous.__wrapped__, num_rows=50_000, interpret=False
    )
    timeit("V4 resident, same 7168 chunks (rows=50k)", f_res, cot, small)

    # V0: full panel kernel
    f_pan = functools.partial(
        sg.segsum_contiguous.__wrapped__, num_rows=rows, interpret=False
    )
    timeit("V0 panel full", f_pan, cot, owners)

    # V1: panel kernel body without the slide/final conditionals (WRONG
    # results — pure cost probe of the per-chunk window add into scratch)
    CHUNK, WIN, PANEL = sg.CHUNK, sg.WIN, sg.PANEL

    def _k_noslide(scalars_ref, owners_ref, cot_ref, out_ref, acc,
                   *, static_off):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        base = scalars_ref[0, c] * 128
        if static_off:
            off = 0
        else:
            off = (scalars_ref[0, c] - scalars_ref[1, c]) * 128
        col = owners_ref[...] - base
        onehot_t = (
            col == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
        ).astype(jnp.bfloat16)
        partial = sg._onehot_dot(cot_ref[...], onehot_t)
        acc[:, pl.ds(off, WIN)] = acc[:, pl.ds(off, WIN)] + partial

        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    def run_noslide(cot, owners, static_off):
        c = p // CHUNK
        base_blk = owners[::CHUNK] // 128
        blk_w, blk_p, blk_s = WIN // 128, PANEL // 128, (PANEL - WIN) // 128
        need = base_blk + blk_w - blk_p
        pb_blk = jnp.maximum(0, -((-need) // blk_s)) * blk_s
        scalars = jnp.stack([base_blk, pb_blk]).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda i, s: (0, i)),
                pl.BlockSpec((d, CHUNK), lambda i, s: (0, i)),
            ],
            out_specs=pl.BlockSpec((d, PANEL), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((d, PANEL), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_k_noslide, static_off=static_off),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((d, PANEL), jnp.float32),
        )(scalars, owners.reshape(1, p), cot)

    f1 = jax.jit(functools.partial(run_noslide, static_off=False))
    timeit("V1 no-slide, dynamic off into scratch", f1, cot, owners)
    f2 = jax.jit(functools.partial(run_noslide, static_off=True))
    timeit("V2 no-slide, off=0", f2, cot, owners)


if __name__ == "__main__":
    main()
