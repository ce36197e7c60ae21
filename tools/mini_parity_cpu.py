import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""CPU mini-repro of the parity-harness densify window (dense oracle backend).

Scaled-down version of tools/parity_harness.py (128x96, ~6k true Gaussians,
sparse init, densify_from=200) to watch the PSNR trajectory across the
densification onset without the TPU. Separates a densify-logic bug (PSNR
collapses here too) from a Pallas pair-budget overflow (collapse only on the
TPU path).
"""
import argparse
import dataclasses as dc
import math

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.core.densify import DensifyConfig
from semantic_gaussians_tpu.pipelines.train import (
    TrainConfig, init_train_state, train_loop,
)
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w
from semantic_gaussians_tpu.utils.losses import psnr as psnr_fn

from parity_harness import build_true_scene, ring_camera


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--stride", type=int, default=4, help="true-scene subsample")
    ap.add_argument("--init-stride", type=int, default=24)
    ap.add_argument("--backend", default="dense")
    ap.add_argument("--eval-every", type=int, default=100)
    args = ap.parse_args()

    rng = np.random.default_rng(11)
    w, h = args.width, args.height
    tpts, tcols = build_true_scene(rng)
    tpts, tcols = tpts[:: args.stride], tcols[:: args.stride]
    print(f"true scene: {len(tpts)} gaussians; {w}x{h}")
    true_params, true_alive = init_from_pcd(tpts, tcols, sh_degree=3)

    make = make_camera_from_c2w
    train_cams = [ring_camera(i + 0.5 / 24, 24, w, h, make=make) for i in range(24)]
    test_cams = [
        ring_camera(i + 0.37, 6, w, h, radius=2.75, height=0.7, make=make)
        for i in range(6)
    ]
    gt = [
        np.clip(np.asarray(
            render(c, true_params, true_alive, backend=args.backend)["render"]
        ), 0, 1).astype(np.float32)
        for c in train_cams + test_cams
    ]
    train_cams = [
        dc.replace(c, image=jnp.asarray(gt[i])) for i, c in enumerate(train_cams)
    ]
    test_gt = gt[len(train_cams):]
    print("GT done")

    sel = np.arange(0, len(tpts), args.init_stride)
    init_cols = np.clip(tcols[sel] + rng.normal(0, 0.08, (len(sel), 3)), 0, 1)
    params, alive = init_from_pcd(
        tpts[sel].astype(np.float32), init_cols.astype(np.float32),
        sh_degree=3, capacity=8192,
    )
    state = init_train_state(params, alive)
    # scale the schedule down 2.5x (500->200 onset) but keep structure
    cfg = TrainConfig(
        densify_from_iter=200, densify_until_iter=1200,
        opacity_reset_interval=1000,
    )
    scene_extent = 3.2

    def test_psnr(state, it):
        vals = []
        for cam, g in zip(test_cams, test_gt):
            img = render(cam, state.params, alive=state.alive,
                         active_sh_degree=min(3, it // 1000),
                         backend=args.backend)["render"]
            vals.append(float(psnr_fn(img, jnp.asarray(g))))
        return float(np.mean(vals))

    key = jax.random.PRNGKey(0)
    it = 0
    while it < args.iters:
        n = min(args.eval_every, args.iters - it)
        key2 = jax.random.fold_in(key, it)
        state, _ = train_loop(
            state, train_cams, cfg, key2, scene_extent=scene_extent,
            num_iters=n, iter_offset=it, backend=args.backend,
            steps_per_dispatch=10, shuffle_seed=it,
        )
        it += n
        n_alive = int(np.asarray(state.alive).sum())
        op = np.asarray(state.params.opacity)[np.asarray(state.alive), 0]
        sc = np.asarray(state.params.scales)[np.asarray(state.alive)].max(-1)
        print(
            f"iter {it}: alive {n_alive} test-PSNR {test_psnr(state, it):.2f} "
            f"op_med {np.median(op):.3f} scale_q99 {np.quantile(sc, 0.99):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
