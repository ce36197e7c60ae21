"""Cot-permute sort A/B (VERDICT r4 item 4): the last unconceded
speed-of-light rows are the sorts. Variants for applying the tile->gen
permutation to 10 cotangent rows at the bench config (P=393,216):

  a) current: ONE 10-payload lax.sort keyed by gen_of_tile_pos
  b) int sort builds the inverse permutation + per-column lane gather
     (binning.py measured 1.78 ms for the gather alone in round 3)
  c) int sort + ROW-layout gather: transpose (G,P)->(P,G), one row gather
     (40 B rows ride the gather floor), transpose back
  d) scatter-built inverse (unique-index .at[].set) + row gather — prices
     one radix-partition pass's scatter for the concession arithmetic

Timing methodology = bench.py: one dispatch, `inner` chained dependent
iterations on device.
"""
import sys
import time

import numpy as np

from common import setup

jax = setup("--cpu" in sys.argv)
import jax.numpy as jnp

P = 393_216
G = 10


def timeit(fn, cot_in, perm_in, inner=10, iters=3):
    @jax.jit
    def chained(x):
        def body(i, acc):
            out = fn(acc, perm_in)
            return acc + out[0, 0] * 1e-30

        return jax.lax.fori_loop(0, inner, body, x)

    jax.block_until_ready(chained(cot_in))  # compile
    t0 = time.perf_counter()
    out = cot_in
    for _ in range(iters):
        out = chained(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3


def main():
    rng = np.random.default_rng(0)
    perm = rng.permutation(P).astype(np.int32)  # gen_of_tile_pos
    cot = rng.normal(size=(G, P)).astype(np.float32)
    perm_j = jnp.asarray(perm)
    cot_j = jnp.asarray(cot)
    iota = jnp.arange(P, dtype=jnp.int32)

    oracle = cot[:, np.argsort(perm)]

    def variant_a(cot_in, perm_in):
        rows = tuple(cot_in[i] for i in range(G))
        outs = jax.lax.sort((perm_in,) + rows, num_keys=1, is_stable=False)
        return jnp.stack(outs[1:], axis=0)

    def variant_b(cot_in, perm_in):
        _, inv = jax.lax.sort((perm_in, iota), num_keys=1, is_stable=False)
        return cot_in[:, inv]

    def variant_c(cot_in, perm_in):
        _, inv = jax.lax.sort((perm_in, iota), num_keys=1, is_stable=False)
        return cot_in.T[inv].T

    def variant_d(cot_in, perm_in):
        inv = jnp.zeros((P,), jnp.int32).at[perm_in].set(
            iota, unique_indices=True
        )
        return cot_in.T[inv].T

    for name, fn in [
        ("a sort10", variant_a),
        ("b invsort+lanegather", variant_b),
        ("c invsort+rowgather", variant_c),
        ("d scatterinv+rowgather", variant_d),
    ]:
        out = np.asarray(fn(cot_j, perm_j))
        ok = np.array_equal(out, oracle)
        ms = timeit(fn, cot_j, perm_j)
        print(f"{name}: {ms:.3f} ms  correct={ok}", flush=True)


if __name__ == "__main__":
    main()
