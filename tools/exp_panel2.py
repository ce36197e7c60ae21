"""Panel-segsum slowdown bisect, round 2: a ladder of kernels that all
consume the full cotangent stream, from pure streaming up to the full
rolling panel. Also: resident-path chunk-count scaling with production-like
advancing owners."""
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

    CHUNK, WIN, PANEL, STRIDE = sg.CHUNK, sg.WIN, sg.PANEL, sg.STRIDE
    d, p = 16, 3_670_016
    nchunks = p // CHUNK
    rng = np.random.default_rng(0)
    cot = jnp.asarray(rng.normal(size=(d, p)).astype(np.float32))

    def make_owners(rows, pp):
        steps = (rng.uniform(size=pp) < min(1.0, rows / pp * 0.95)).astype(
            np.int32
        )
        steps[0] = 0
        return np.minimum(np.cumsum(steps), rows - 1).astype(np.int32)

    def timeit(label, fn, *a):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms",
              flush=True)
        return out

    # --- resident-path chunk scaling, production-like owners ---
    for pp, rows in [(393_216, 90_000), (786_432, 180_000)]:
        o = jnp.asarray(make_owners(rows, pp))
        f = functools.partial(
            sg.segsum_contiguous.__wrapped__, num_rows=rows, interpret=False
        )
        timeit(f"resident p={pp} rows={rows}", f, cot[:, :pp], o)

    owners = jnp.asarray(make_owners(1_000_000, p))

    def scalars_for(owners):
        base_blk = owners[::CHUNK] // 128
        blk_w, blk_p, blk_s = WIN // 128, PANEL // 128, STRIDE // 128
        need = base_blk + blk_w - blk_p
        pb_blk = jnp.maximum(0, -((-need) // blk_s)) * blk_s
        return jnp.stack([base_blk, pb_blk]).astype(jnp.int32)

    # Ladder: every kernel reads all cot blocks and folds them into the
    # output so nothing can be elided.
    def kern_a(s_ref, o_ref, cot_ref, out_ref, acc, *, mode):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        base = s_ref[0, c] * 128
        col = o_ref[...] - base
        onehot_t = (
            col == jax.lax.broadcasted_iota(jnp.int32, (WIN, CHUNK), 0)
        ).astype(jnp.bfloat16)
        partial = sg._onehot_dot(cot_ref[...], onehot_t)  # (d, WIN)
        if mode == "fold":
            acc[:, 0:WIN] = acc[:, 0:WIN] + partial
        else:
            off = (s_ref[0, c] - s_ref[1, c]) * 128
            acc[:, pl.ds(off, WIN)] = acc[:, pl.ds(off, WIN)] + partial

        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    def run(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda i, s: (0, i)),
                pl.BlockSpec((d, CHUNK), lambda i, s: (0, i)),
            ],
            out_specs=pl.BlockSpec((d, PANEL), lambda i, s: (0, 0)),
            scratch_shapes=[pltpu.VMEM((d, PANEL), jnp.float32)],
        )
        f = pl.pallas_call(
            functools.partial(kern_a, mode=mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((d, PANEL), jnp.float32),
        )
        return jax.jit(lambda s, o, ct: f(s, o, ct))

    s = scalars_for(owners)
    ow = owners.reshape(1, p)
    fa = run("fold")
    out_a = timeit("A static fold into acc[:, :WIN]", fa, s, ow, cot)
    print("  A sum:", float(jnp.sum(out_a)))
    fb = run("window")
    out_b = timeit("B dynamic-window add", fb, s, ow, cot)
    print("  B sum:", float(jnp.sum(out_b)))


if __name__ == "__main__":
    main()
