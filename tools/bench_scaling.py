import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Multi-chip scaling benchmark: rays/s at 1..N devices.

Run on a real pod slice (or CPU-simulated mesh with --cpu N) to measure the
north-star scaling efficiency (BASELINE.md: >=80% to 2 hosts):

  * band mode: ONE view's tile rows sharded across chips (render_sharded)
  * view mode: one view per chip, pmean'd gradients (train-step DP)

Prints one JSON line per device count.
"""
import json
import time

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        i = sys.argv.index("--cpu")
        ndev = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", ndev)
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
        )

    import jax.numpy as jnp

    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.parallel.mesh import make_mesh
    from semantic_gaussians_tpu.parallel.render_sharded import render_sharded
    from semantic_gaussians_tpu.utils.camera import make_camera

    total = len(jax.devices())
    w, h = 640, 480
    n = 100_000
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=jnp.asarray(rng.uniform(size=(n, 1, 3)).astype(np.float32)),
        sh_rest=jnp.zeros((n, 0, 3)),
        log_scales=jnp.asarray(
            rng.uniform(-4.5, -3.0, size=(n, 3)).astype(np.float32)
        ),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.asarray(
            rng.uniform(-1.0, 1.5, size=(n, 1)).astype(np.float32)
        ),
    )
    alive = jnp.ones((n,), bool)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, w, h)
    target = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))

    base = None
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= total]
    for ndev in counts:
        mesh = make_mesh(ndev)

        @jax.jit
        def step(p):
            out = render_sharded(cam, p, alive, mesh, pair_budget=655_360 // ndev)
            return jnp.mean((out["render"] - target) ** 2)

        grad = jax.jit(jax.grad(step))
        jax.block_until_ready(grad(params))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            g = grad(params)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / iters
        rays = w * h / dt
        if base is None:
            base = rays
        eff = rays / (base * ndev)
        print(
            json.dumps(
                {
                    "mode": "band",
                    "devices": ndev,
                    "rays_per_s": round(rays, 1),
                    "step_ms": round(dt * 1e3, 2),
                    "scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
