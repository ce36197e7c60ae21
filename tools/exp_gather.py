import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Pair-pack gather/scatter/sort layout microbench (TPU).

Decides the pair-stream layout. Honest chaining: every step derives the next
iteration's *indices/keys* from |all values| produced by the op under test,
so XLA cannot hoist, fold, or DCE-narrow it. `calib` (big-array multiply)
checks the harness against known HBM bandwidth (~800 GB/s on v5e).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INNER = 20


def timeit(step, ids0, *rest, iters=3):
    def run(ids, *rest):
        return jax.lax.fori_loop(0, INNER, lambda i, v: step(v, *rest), ids)

    jfn = jax.jit(run)
    out = jax.block_until_ready(jfn(ids0, *rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(jfn(ids0, *rest))
    del out
    return (time.perf_counter() - t0) / (iters * INNER) * 1e3


def main():
    n, p, d = 100_000, 393_216, 12
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(n + 1, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, size=(p,)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(p, d)).astype(np.float32))

    def rotate(ids, s):
        return (ids + s.astype(jnp.int32)) % n

    # calibration: 151 MB multiply; all elements consumed via row-abs-sums
    big = jnp.asarray(rng.normal(size=(512, 36 * 2048)).astype(np.float32))

    def f_calib(ids, big):
        y = big * (1.0 + ids[0].astype(jnp.float32) * 1e-30)
        s = jnp.abs(y).sum(axis=0)  # (73728,) consumes every element
        return rotate(ids, jnp.tile(s, p // s.shape[0] + 1)[:p] * 7.0)

    mb = big.size * 4 * 2 / 1e6
    t = timeit(f_calib, ids, big)
    print(f"calib {mb:.0f}MB r+w: {t:7.3f} ms  ({mb / t:.0f} GB/s)")

    def f_rowsT(ids, pk):
        g = pk[ids].T  # (D, P)
        return rotate(ids, jnp.abs(g).sum(axis=0) * 7.0)

    def f_rows(ids, pk):
        g = pk[ids]
        return rotate(ids, jnp.abs(g).sum(axis=1) * 7.0)

    def f_scatter(ids, c):
        out = jnp.zeros((n + 1, d), jnp.float32).at[ids].add(c)
        s = jnp.abs(out).sum()  # scalar, consumes all
        return rotate(ids, s * 1e-6 + jnp.zeros((p,)))

    print(f"P={p} N={n} D={d}  ({p*d*4/1e6:.1f} MB payload)")
    print(f"rowsT    : {timeit(f_rowsT, ids, packed):7.3f} ms")
    print(f"rows     : {timeit(f_rows, ids, packed):7.3f} ms")
    print(f"scatter  : {timeit(f_scatter, ids, cot):7.3f} ms")

    pkb = packed.astype(jnp.bfloat16)
    cotb = cot.astype(jnp.bfloat16)

    def f_rows16(ids, pk):
        g = pk[ids]
        return rotate(ids, jnp.abs(g.astype(jnp.float32)).sum(axis=1) * 7.0)

    def f_scatter16(ids, c):
        out = jnp.zeros((n + 1, d), jnp.bfloat16).at[ids].add(c)
        s = jnp.abs(out.astype(jnp.float32)).sum()
        return rotate(ids, s * 1e-6 + jnp.zeros((p,)))

    print(f"rows bf16: {timeit(f_rows16, ids, pkb):7.3f} ms")
    print(f"sct  bf16: {timeit(f_scatter16, ids, cotb):7.3f} ms")

    for dd in (4, 12, 64, 512):
        pk = jnp.asarray(rng.normal(size=(n + 1, dd)).astype(np.float32))

        def f_g(ids, pk):
            g = pk[ids]
            return rotate(ids, jnp.abs(g).sum(axis=1) * 7.0)

        print(f"gather D={dd:3d}: {timeit(f_g, ids, pk):7.3f} ms")

    for k in (1, 2, 6, 14):
        pay = tuple(
            jnp.asarray(rng.normal(size=(p,)).astype(np.float32))
            for _ in range(k)
        )

        def f_sort(ids, *pay):
            key = ids % 600
            out = jax.lax.sort((key, *pay), num_keys=1, is_stable=True)
            s = sum(jnp.abs(o) for o in out[1:]) + out[0]
            return rotate(ids, s * 7.0)

        print(f"sort k={k:2d} : {timeit(f_sort, ids, *pay):7.3f} ms")

    # Cotangent-permute candidates for _pack_gather_bwd: the live code does
    # a LANE gather cot[:, ids] on a (D, P) array. Alternatives: explicit
    # transpose -> row gather -> transpose, and gathering a (P, D) layout
    # (would also need the segsum kernel to accept row-major cotangents).
    cotT = jnp.asarray(np.ascontiguousarray(np.asarray(cot)))  # (P, D)
    cotDP = jnp.asarray(np.asarray(cot).T.copy())  # (D, P)
    pids = jnp.asarray(rng.permutation(p).astype(np.int32))

    def f_laneg(ids, c):
        g = c[:, ids % p]  # (D, P) lane gather
        return rotate(ids, jnp.abs(g).sum(axis=0) * 7.0)

    def f_lane_via_T(ids, c):
        g = c.T[ids % p].T  # transpose -> row gather -> transpose
        return rotate(ids, jnp.abs(g).sum(axis=0) * 7.0)

    def f_rowg_pd(ids, c):
        g = c[ids % p]  # (P, D) row gather (needs segsum layout change)
        return rotate(ids, jnp.abs(g).sum(axis=1) * 7.0)

    print(f"cot lane gather (D,P)[:,ids] : {timeit(f_laneg, pids, cotDP):7.3f} ms")
    print(f"cot via double transpose     : {timeit(f_lane_via_T, pids, cotDP):7.3f} ms")
    print(f"cot row gather (P,D)[ids]    : {timeit(f_rowg_pd, pids, cotT):7.3f} ms")

    def f_sortseg(ids, c):
        cols = tuple(c[:, j] for j in range(d))
        out = jax.lax.sort((ids, *cols), num_keys=1, is_stable=False)
        sid = out[0]
        vals = jnp.stack(out[1:], axis=-1)
        seg = jax.ops.segment_sum(vals, sid, num_segments=n + 1)
        s = jnp.abs(seg).sum()
        return rotate(ids, s * 1e-6 + jnp.zeros((p,)))

    print(f"sort+seg : {timeit(f_sortseg, ids, cot):7.3f} ms")


if __name__ == "__main__":
    main()
