import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Hardware validation of the rolling-panel segsum kernel (ops.segsum).

The panel kernel accumulates the SAME per-chunk one-hot partials in the
SAME chunk order as the VMEM-resident fast path — flush/shift only moves
finished columns — so on identical inputs the two must agree BITWISE.
This drives both paths on the real chip at a size where the resident path
still fits, asserts exact equality, then times the panel kernel at the
1M-gaussian bench scale (d=16, p=3.67M, rows=1M — the config whose old
RMW-windowed fallback measured 11.2 ms in the 110 ms step profile).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
        )
    import semantic_gaussians_tpu.ops.segsum as segsum_mod

    print("backend:", jax.default_backend())
    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    # --- bitwise equivalence, resident vs panel (d=16, rows=50k) ---
    d, p, rows = 16, 64 * segsum_mod.CHUNK, 50_000
    cot = rng.normal(size=(d, p)).astype(np.float32)
    steps = (rng.uniform(size=p) < rows / p * 0.9).astype(np.int32)
    steps[0] = 0
    owners = np.minimum(np.cumsum(steps), rows - 1).astype(np.int32)
    fn = segsum_mod.segsum_contiguous.__wrapped__
    res = np.asarray(fn(jnp.asarray(cot), jnp.asarray(owners), rows,
                        interpret=interp))
    saved_vmem_budget = segsum_mod.VMEM_ACC_BYTES
    try:
        segsum_mod.VMEM_ACC_BYTES = 0  # force panel
        pan = np.asarray(fn(jnp.asarray(cot), jnp.asarray(owners), rows,
                            interpret=interp))
    finally:
        segsum_mod.VMEM_ACC_BYTES = saved_vmem_budget
    bitwise = np.array_equal(res, pan)
    print(f"resident-vs-panel bitwise equal: {bitwise} "
          f"(max|d|={np.abs(res - pan).max():.1e})")
    assert bitwise

    if interp:
        print("cpu: skipping the 1M-scale timing (interpret mode)")
        return

    # --- panel timing at the 1M bench scale ---
    # Timing methodology (same as bench.py): ONE dispatch running `inner`
    # chained iterations on device, each feeding a scalar of the previous
    # output back into the input. Un-chained same-args loops through the
    # axon tunnel produced wild artifacts both ways (625 ms when the
    # surrounding ops ran eagerly per-dispatch; 0.03 ms — above HBM
    # bandwidth, i.e. elided — when re-running identical args).
    d, p, rows = 16, 3_670_016, 1_000_000
    cot = jnp.asarray(rng.normal(size=(d, p)).astype(np.float32))
    steps = (rng.uniform(size=p) < rows / p * 0.95).astype(np.int32)
    steps[0] = 0
    owners = jnp.asarray(
        np.minimum(np.cumsum(steps), rows - 1).astype(np.int32)
    )
    inner = 10

    @jax.jit
    def chained(cot):
        def body(i, ct):
            out = segsum_mod.segsum_contiguous(ct, owners, rows)
            return ct + out[0:1, 0:1] * 1e-30

        return jax.lax.fori_loop(0, inner, body, cot)

    jax.block_until_ready(chained(cot))
    iters = 3
    t0 = time.perf_counter()
    out = cot
    for _ in range(iters):
        out = chained(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(f"panel segsum d={d} p={p} rows={rows}: {dt * 1e3:.2f} ms "
          f"(old RMW-windowed: 11.2 ms in the 1M step profile)")


if __name__ == "__main__":
    main()
