"""Headline benchmark: rays/s per chip, forward+backward, 640x480.

Prints ONE JSON line {metric, value, unit, vs_baseline, ...}. Runs the full
differentiable path (projection -> binning -> Pallas composite fwd -> bwd ->
segment-sum -> Adam-style grad reduction) on a synthetic 100k-Gaussian scene
at ScanNet eval resolution (BASELINE.md north star). vs_baseline is measured
against a nominal 1e8 rays/s for the CUDA reference's fwd+bwd on its dev GPU
(RTX 4090; the reference publishes no throughput numbers — BASELINE.md).
"""
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--n", type=int, default=100_000,
        help="gaussian count; 100k is the headline config, 1M matches "
        "BASELINE config #2 (ScanNet-full scale)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: TPU kernel compiles go through a slow remote
    # AOT service here; caching makes reruns (and the driver's bench) fast.
    cache_dir = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera

    from semantic_gaussians_tpu.core.gaussians import GaussianParams

    w, h = 640, 480
    n = args.n
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    # Build params directly (no 3-NN init: it runs once per scene and its
    # 100k-point compile would eat the bench time budget).
    k = 16
    sh_dc = ((jnp.asarray(cols) - 0.5) / 0.28209479177387814)[:, None, :]
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=sh_dc,
        sh_rest=jnp.zeros((n, k - 1, 3)),
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

    # Probe the scene's pair count once, then size the budget with the SAME
    # policy train_loop's adaptive mode converges to (quarter-pow2 granules,
    # 1.25x headroom): everything in the pair stream (gathers, sorts, the
    # segment sum) scales with the static budget, not the live pair count.
    from semantic_gaussians_tpu.ops.binning import default_pair_budget

    probe = render(
        cam, params, alive=alive,
        pair_budget=max(1 << 20, default_pair_budget(n)),
    )
    pairs = int(probe["num_pairs"])
    assert int(probe["overflow"]) == 0, "probe budget overflow"
    from semantic_gaussians_tpu.pipelines.train import tuned_pair_budget

    budget = tuned_pair_budget(pairs)

    def loss(params):
        out = render(cam, params, alive=alive, pair_budget=budget)
        return jnp.mean((out["render"] - target) ** 2)

    ov = render(cam, params, alive=alive, pair_budget=budget)["overflow"]
    assert int(ov) == 0, f"pair budget overflow: {int(ov)}"

    grad = jax.grad(loss)
    inner = 10

    @jax.jit
    def chained(params):
        # One dispatch, `inner` dependent fwd+bwd steps on device — isolates
        # device throughput from host/tunnel dispatch latency.
        def body(i, p):
            g = grad(p)
            return jax.tree.map(lambda x, y: x - 1e-30 * y, p, g)

        return jax.lax.fori_loop(0, inner, body, params)

    jax.block_until_ready(chained(params))  # compile
    iters = 3
    t0 = time.perf_counter()
    out = params
    for _ in range(iters):
        out = chained(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * inner)

    rays_per_s = w * h / dt
    label = f"{n // 1000}k" if n < 1_000_000 else f"{n / 1e6:g}M"
    print(
        json.dumps(
            {
                "metric": f"rays/s per chip (fwd+bwd), 640x480, {label} Gaussians",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / 1e8, 4),
                "step_ms": round(dt * 1e3, 2),
                "pairs": pairs,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
