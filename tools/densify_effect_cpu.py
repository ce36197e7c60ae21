import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Isolate the instantaneous effect of one densify event on test PSNR (CPU).

Trains the mini scene to the densify onset, then measures PSNR (a) right
before, (b) immediately after a single densify_and_prune (no training), for
clone-only / split-only / prune-only / full variants, and (c) after 100
follow-up training iters. Distinguishes the clone-alpha-doubling transient
(reference-faithful) from a gradient/moment bug (post-densify training makes
things worse instead of better).
"""
import dataclasses as dc

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.core.densify import DensifyConfig
from semantic_gaussians_tpu.pipelines.train import (
    TrainConfig, densify_step, init_train_state, train_loop,
)
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w
from semantic_gaussians_tpu.utils.losses import psnr as psnr_fn

from parity_harness import build_true_scene, ring_camera


def main():
    rng = np.random.default_rng(11)
    w, h = 128, 96
    tpts, tcols = build_true_scene(rng)
    tpts, tcols = tpts[::4], tcols[::4]
    true_params, true_alive = init_from_pcd(tpts, tcols, sh_degree=3)
    make = make_camera_from_c2w
    train_cams = [ring_camera(i + 0.5 / 24, 24, w, h, make=make) for i in range(24)]
    test_cams = [
        ring_camera(i + 0.37, 6, w, h, radius=2.75, height=0.7, make=make)
        for i in range(6)
    ]
    gt = [
        np.clip(np.asarray(
            render(c, true_params, true_alive, backend="dense")["render"]
        ), 0, 1).astype(np.float32)
        for c in train_cams + test_cams
    ]
    train_cams = [dc.replace(c, image=jnp.asarray(gt[i])) for i, c in enumerate(train_cams)]
    test_gt = gt[len(train_cams):]

    sel = np.arange(0, len(tpts), 24)
    init_cols = np.clip(tcols[sel] + rng.normal(0, 0.08, (len(sel), 3)), 0, 1)
    params, alive = init_from_pcd(
        tpts[sel].astype(np.float32), init_cols.astype(np.float32),
        sh_degree=3, capacity=8192,
    )
    state = init_train_state(params, alive)
    # densify OFF during warmup: onset beyond warmup horizon
    cfg = TrainConfig(densify_from_iter=10_000, densify_until_iter=20_000)
    extent = 3.2

    def tp(st):
        vals = [
            float(psnr_fn(
                render(c, st.params, alive=st.alive, active_sh_degree=0,
                       backend="dense")["render"], jnp.asarray(g)))
            for c, g in zip(test_cams, test_gt)
        ]
        return float(np.mean(vals))

    key = jax.random.PRNGKey(0)
    state, _ = train_loop(
        state, train_cams, cfg, key, scene_extent=extent, num_iters=200,
        backend="dense", steps_per_dispatch=10,
    )
    base_psnr = tp(state)
    n0 = int(np.asarray(state.alive).sum())
    grads = np.asarray(state.dstate.xyz_grad_accum / np.maximum(np.asarray(state.dstate.denom), 1))
    gq = np.quantile(grads[np.asarray(state.alive)], [0.1, 0.5, 0.9, 0.99])
    print(f"warmup 200 iters: alive {n0} PSNR {base_psnr:.2f}")
    print(f"avg-grad quantiles (thr 2e-4): {gq}")

    variants = dict(
        full=DensifyConfig(),
        prune_only=DensifyConfig(grad_threshold=1e9),
        clone_only=DensifyConfig(min_opacity=-1.0, percent_dense=1e9),
        split_only=DensifyConfig(min_opacity=-1.0, percent_dense=0.0),
    )
    for name, dcfg in variants.items():
        cfg_v = dc.replace(cfg, densify=dcfg)
        st2, dropped = densify_step(
            state, jax.random.PRNGKey(7), extent, cfg_v, use_screen_size=False
        )
        n1 = int(np.asarray(st2.alive).sum())
        p_after = tp(st2)
        # 100 follow-up training iters
        st3, _ = train_loop(
            st2, train_cams, cfg, jax.random.PRNGKey(9), scene_extent=extent,
            num_iters=100, iter_offset=300, backend="dense",
            steps_per_dispatch=10,
        )
        print(
            f"{name:11s}: alive {n0}->{n1}  PSNR {base_psnr:.2f} -> "
            f"{p_after:.2f} (instant) -> {tp(st3):.2f} (+100 iters)",
            flush=True,
        )


if __name__ == "__main__":
    main()
