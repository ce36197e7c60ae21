import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Layout microbenchmark: does XLA:TPU pad small trailing dims to (8,128)?

Times a 50-deep elementwise chain over the same 4.8M floats stored as
(100000,16,3) / (100000,48) / (4800000,), and the projection-style batched
tiny matmul (N,2,3)@(3,3) vs its hand-expanded component (SoA) form.
Decides whether the projection/SH stack should be rewritten SoA.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=20):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def chain(x):
    def body(i, x):
        return x * 1.0001 + 1e-7
    return jax.lax.fori_loop(0, 50, body, x)


def main():
    n = 100_000
    rng = np.random.default_rng(0)
    base = rng.normal(size=(n, 16, 3)).astype(np.float32)
    x1 = jnp.asarray(base)
    x2 = jnp.asarray(base.reshape(n, 48))
    x3 = jnp.asarray(base.reshape(-1))
    print(f"elementwise x50 (N,16,3): {timeit(chain, x1):7.3f} ms")
    print(f"elementwise x50 (N,48)  : {timeit(chain, x2):7.3f} ms")
    print(f"elementwise x50 (4.8M,) : {timeit(chain, x3):7.3f} ms")

    W = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    cov = jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32))

    def batched(m, cov, W):
        def body(i, mc):
            m, c = mc
            t = m @ W.T
            tz = jnp.where(t[:, 2] > 0.2, t[:, 2], 1.0)
            inv_z = 1.0 / tz
            zeros = jnp.zeros_like(tz)
            J = jnp.stack(
                [
                    jnp.stack([inv_z, zeros, -t[:, 0] * inv_z * inv_z], axis=-1),
                    jnp.stack([zeros, inv_z, -t[:, 1] * inv_z * inv_z], axis=-1),
                ],
                axis=-2,
            )
            JW = J @ W
            c2 = JW @ c @ jnp.swapaxes(JW, -1, -2)
            upd = c2[:, 0, 0] + c2[:, 0, 1] + c2[:, 1, 1]
            return (m + 1e-12 * upd[:, None], c)
        return jax.lax.fori_loop(0, 20, body, (m, cov))[0]

    def soa(m, cov, W):
        def body(i, mc):
            m, c = mc
            mx, my, mz = m[:, 0], m[:, 1], m[:, 2]
            tx = mx * W[0, 0] + my * W[0, 1] + mz * W[0, 2]
            ty = mx * W[1, 0] + my * W[1, 1] + mz * W[1, 2]
            tz0 = mx * W[2, 0] + my * W[2, 1] + mz * W[2, 2]
            tz = jnp.where(tz0 > 0.2, tz0, 1.0)
            inv_z = 1.0 / tz
            j02 = -tx * inv_z * inv_z
            j12 = -ty * inv_z * inv_z
            # JW rows: r0 = inv_z*W0 + j02*W2 ; r1 = inv_z*W1 + j12*W2
            r0 = [inv_z * W[0, k] + j02 * W[2, k] for k in range(3)]
            r1 = [inv_z * W[1, k] + j12 * W[2, k] for k in range(3)]
            cc = [[c[:, a, b] for b in range(3)] for a in range(3)]
            def quad(u, v):
                s = 0.0
                for a in range(3):
                    t_ = 0.0
                    for b in range(3):
                        t_ = t_ + cc[a][b] * v[b]
                    s = s + u[a] * t_
                return s
            upd = quad(r0, r0) + quad(r0, r1) + quad(r1, r1)
            return (m + 1e-12 * upd[:, None], c)
        return jax.lax.fori_loop(0, 20, body, (m, cov))[0]

    print(f"cov2d batched x20 : {timeit(batched, m, cov, W):7.3f} ms")
    print(f"cov2d SoA x20     : {timeit(soa, m, cov, W):7.3f} ms")


if __name__ == "__main__":
    main()
