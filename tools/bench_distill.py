import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Distill-path throughput bench: sparse MinkUNet fwd+bwd voxels/s.

The 3D-distillation hot loop (reference distill.py:95-131: MinkUNet34A over
~10^5-voxel ScanNet rooms, 56-dim Gaussian features -> 768-dim CLIP space,
cosine loss, AdamW) measured end-to-end INCLUDING per-step topology builds
(the reference rebuilds ME coordinate maps per batch too). Scene shape is
room-like (walls/floor surfaces), not uniform noise, so neighbor density and
stride-pool occupancy resemble real data.

Usage: python tools/bench_distill.py [--tiny] [--voxels N] [--arch MinkUNet34A]
"""
import argparse
import time

import numpy as np


def room_voxels(n_target: int, rng) -> np.ndarray:
    """~n_target unique voxel coords forming a box room + clutter."""
    side = int(np.sqrt(n_target / 6.0)) + 1
    g = np.arange(side)
    xx, yy = np.meshgrid(g, g)
    planes = []
    for z in (0, side - 1):  # floor / ceiling
        planes.append(np.stack([xx, yy, np.full_like(xx, z)], -1).reshape(-1, 3))
        planes.append(np.stack([xx, np.full_like(xx, z), yy], -1).reshape(-1, 3))
        planes.append(np.stack([np.full_like(xx, z), xx, yy], -1).reshape(-1, 3))
    pts = np.concatenate(planes)
    # clutter blobs
    blob = rng.normal(size=(n_target // 4, 3)) * side / 8 + side / 2
    pts = np.concatenate([pts, blob.astype(np.int64)])
    pts = np.unique(np.clip(pts, 0, 1000), axis=0)
    rng.shuffle(pts)
    return pts[:n_target].astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU sanity run")
    ap.add_argument("--voxels", type=int, default=131072)
    ap.add_argument("--arch", default="MinkUNet34A")
    ap.add_argument("--feature-dim", type=int, default=768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semantic_gaussians_tpu.utils.platform import setup_backend

    if args.tiny:
        import os

        os.environ.setdefault("SGTPU_PLATFORM", "cpu")
        args.voxels, args.arch, args.feature_dim = 2048, "MinkUNet14A", 32
    backend = setup_backend()
    print(f"backend={backend} voxels={args.voxels} arch={args.arch}")

    from semantic_gaussians_tpu.pipelines.distill import (
        DistillConfig,
        make_distill_state,
    )
    from semantic_gaussians_tpu.models.unet3d import build_topology

    cfg = DistillConfig(
        model_3d=args.arch, feature_dim=args.feature_dim, in_channels=56
    )
    rng = np.random.default_rng(0)
    coords = jnp.asarray(room_voxels(args.voxels, rng))
    n = coords.shape[0]
    mask = jnp.ones((n,), bool)
    feats = jnp.asarray(rng.normal(size=(n, 56)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(n, args.feature_dim)).astype(np.float32))
    gt_mask = jnp.asarray(rng.uniform(size=(n,)) > 0.2)

    model, variables, tx, opt_state = make_distill_state(
        cfg, voxel_budget=min(n, 512), steps_per_epoch=100
    )

    # Chained steps in one dispatch (same harness rule as bench.py: the axon
    # tunnel costs ~90 ms/call; measure device throughput, not dispatch).
    from semantic_gaussians_tpu.pipelines.distill import make_distill_step

    step = make_distill_step(model, tx, cfg)

    inner = 3 if args.tiny else 5

    def chained(variables, opt_state):
        loss = jnp.zeros(())
        for _ in range(inner):  # unrolled: step output feeds the next step
            variables, opt_state, loss = step(
                variables, opt_state, coords, feats, gt, gt_mask, mask
            )
        return variables, opt_state, loss

    jfn = jax.jit(chained)
    out = jax.block_until_ready(jfn(variables, opt_state))
    t0 = time.perf_counter()
    iters = 2 if args.tiny else 4
    for _ in range(iters):
        out = jfn(out[0], out[1])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(
        f"distill step (fwd+bwd+adamw+topology): {dt*1e3:.2f} ms  "
        f"{n/dt/1e6:.2f} Mvoxels/s  loss={float(out[2]):.4f}"
    )

    # forward-only (eval_segmentation's per-scene inference path)
    @jax.jit
    def fwd(variables):
        topo = build_topology(coords, mask)
        return model.apply(variables, feats, topo, train=False)

    jax.block_until_ready(fwd(out[0]))
    t0 = time.perf_counter()
    for _ in range(iters * inner):
        y = fwd(out[0])
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(f"inference fwd (+topology): {dt*1e3:.2f} ms  {n/dt/1e6:.2f} Mvoxels/s")


if __name__ == "__main__":
    main()
