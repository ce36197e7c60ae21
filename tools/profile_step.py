import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Capture a device trace of the bench train step and print the op breakdown."""
import shutil
import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera
    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.utils.logging_utils import profile_trace, top_ops

    w, h = args.width, args.height
    n = args.n
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    k = 16
    sh_dc = ((jnp.asarray(cols) - 0.5) / 0.28209479177387814)[:, None, :]
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=sh_dc,
        sh_rest=jnp.zeros((n, k - 1, 3)),
        log_scales=jnp.asarray(
            (rng.uniform(-4.5, -3.0, size=(n, 3))
             - np.log(max(n / 1e5, 1.0)) / 3.0).astype(np.float32)
        ),  # density-scaled sizes, same law as bench.py
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.asarray(
            rng.uniform(-1.0, 1.5, size=(n, 1)).astype(np.float32)
        ),
    )
    alive = jnp.ones((n,), bool)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, w, h)
    target = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    # Same tuned-budget policy as bench.py (VERDICT r2: profile at the
    # budget the bench actually runs, not a stale 655k).
    from semantic_gaussians_tpu.pipelines.train import tuned_pair_budget

    from semantic_gaussians_tpu.ops.binning import default_pair_budget

    probe = render(
        cam, params, alive=alive,
        pair_budget=max(1 << 20, min(default_pair_budget(n), (1 << 24) - 8192)),
    )
    budget = tuned_pair_budget(int(probe["num_pairs"]))
    print(f"pairs={int(probe['num_pairs'])} tuned budget={budget}")

    def loss(params):
        out = render(cam, params, alive=alive, pair_budget=budget)
        return jnp.mean((out["render"] - target) ** 2)

    @jax.jit
    def step(p):
        g = jax.grad(loss)(p)
        return jax.tree.map(lambda x, y: x - 1e-30 * y, p, g)

    jax.block_until_ready(step(params))  # compile outside the trace

    steps = 5
    tdir = "/tmp/sgtpu_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    with profile_trace(tdir):
        out = params
        for _ in range(steps):
            out = step(out)
        jax.block_until_ready(out)

    rows = top_ops(tdir, k=45, steps=steps)
    total = sum(ms for ms, _ in rows)
    print(f"top ops (per step, {steps} steps traced); shown total {total:.2f} ms")
    for ms, name in rows:
        print(f"{ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
