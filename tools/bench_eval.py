import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
"""Serving-path throughput: open-vocab segmentation eval, views/s.

Measures the per-view python loop vs the chunked device scan
(pipelines.eval_segmentation._eval_chunk) on a synthetic eval-shaped
workload: N Gaussians, [cap, C] features, K+1 text rows, per-view
render -> similarity -> argmax -> confusion. The chunked path returns one
[K, K+1] confusion per chunk, so per-view dispatch latency (~90 ms over
this sandbox's tunnel) and [H, W] transfers drop out.

Usage: python tools/bench_eval.py [--cpu] [--n 100000] [--c 768]
       [--views 16] [--chunk 8] [--w 640] [--h 480] [--pred3d]
"""
import argparse
import time

import numpy as np

from common import random_cloud_params, setup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--c", type=int, default=768)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--classes", type=int, default=19)
    ap.add_argument("--pred3d", action="store_true")
    ap.add_argument("--pair-budget", type=int, default=262_144)
    args = ap.parse_args()

    jax = setup(args.cpu)
    import jax.numpy as jnp

    from semantic_gaussians_tpu.pipelines.eval_segmentation import eval_views
    from semantic_gaussians_tpu.utils.camera import make_camera

    print("backend:", jax.default_backend(),
          f"n={args.n} C={args.c} {args.w}x{args.h} views={args.views}")
    params, alive, rng = random_cloud_params(args.n)
    gauss_feats = jnp.asarray(
        rng.normal(size=(args.n, args.c)).astype(np.float32)
    )
    text = rng.normal(size=(args.classes + 1, args.c)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    cams = [
        make_camera(np.eye(3), np.array([0.02 * i, 0, 0], np.float32),
                    1.4, 1.1, args.w, args.h)
        for i in range(args.views)
    ]
    gts = [
        rng.integers(0, args.classes + 1, size=(args.h, args.w))
        for _ in range(args.views)
    ]
    labels = [f"c{i}" for i in range(args.classes)]

    def run(chunk):
        return eval_views(
            cams, gts, params, alive, gauss_feats, text, labels,
            pred_on_3d=args.pred3d, chunk_views=chunk,
        )

    results = {}
    for name, chunk in (("per_view", 0), ("chunked", args.chunk)):
        t0 = time.time()
        miou, _, conf = run(chunk)  # compile + correctness
        compile_s = time.time() - t0
        t0 = time.time()
        miou2, _, conf2 = run(chunk)
        dt = time.time() - t0
        results[name] = (args.views / dt, conf)
        print(f"{name:>9}: {args.views / dt:7.2f} views/s "
              f"({dt / args.views * 1e3:6.1f} ms/view; first call "
              f"{compile_s:.1f}s) mIoU {miou:.4f}")
    np.testing.assert_array_equal(results["per_view"][1], results["chunked"][1])
    speedup = results["chunked"][0] / results["per_view"][0]
    print(f"confusions identical; chunked speedup {speedup:.2f}x")


if __name__ == "__main__":
    main()
