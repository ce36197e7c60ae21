import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""AMG (automatic mask generation) throughput bench (VERDICT r2 weak #6).

The SAMCLIP predictor is the flagship native 2D provider and the automask
point sweep is its hot loop: per point batch, a prompt-decode + TWO chained
full-image bilinear resizes (models/automask.py _predict_fn). This bench
measures masks/s at 640x480 with a tiny SAM (structure identical to vit_h,
toy widths — the resize cost, which dominates and is width-independent, is
realistic; encoder cost is reported separately since it scales with the
backbone).

Usage: python tools/bench_amg.py [--points 256] [--batch 64]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # honors SGTPU_PLATFORM=cpu
    import jax

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from semantic_gaussians_tpu.models.automask import AutoMaskConfig, SamAutoMask
    from semantic_gaussians_tpu.models.sam import Sam, SamConfig, preprocess_image

    rng = np.random.default_rng(0)
    cfg = SamConfig.tiny(img_size=256)
    model = Sam(cfg)
    x0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    var = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32)
    )
    gen = SamAutoMask(cfg, var, AutoMaskConfig(points_per_side=16))

    h, w = args.height, args.width
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)

    # encoder (once per image)
    xin, _ = preprocess_image(img, cfg.img_size)
    t0 = time.perf_counter()
    emb = jax.block_until_ready(gen._encode(var, jnp.asarray(xin)[None]))[0]
    enc_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        emb = jax.block_until_ready(gen._encode(var, jnp.asarray(xin)[None]))[0]
    enc_ms = (time.perf_counter() - t0) / 3 * 1e3

    # point-batch decode+upscale (the AMG hot loop)
    run = gen._predict_fn((h, w))
    pts = jnp.asarray(
        rng.uniform(0, cfg.img_size, (args.batch, 1, 2)).astype(np.float32)
    )
    out = jax.block_until_ready(run(var, emb, pts))
    t0 = time.perf_counter()
    iters = max(1, args.points // args.batch)
    for _ in range(iters):
        out = jax.block_until_ready(run(var, emb, pts))
    dt = time.perf_counter() - t0
    masks = iters * args.batch * 3  # s/m/l per point
    print(
        f"device={jax.devices()[0]} {w}x{h} batch={args.batch}\n"
        f"encoder: {enc_ms:.1f} ms/image (tiny backbone; vit_h scales this "
        f"~400x by FLOPs; first-call compile {enc_compile:.0f}s)\n"
        f"decode+upscale: {dt / iters * 1e3:.1f} ms/batch -> "
        f"{masks / dt:.0f} masks/s "
        f"({args.points / dt:.0f} points/s at {args.batch}/batch)"
    )


if __name__ == "__main__":
    main()
