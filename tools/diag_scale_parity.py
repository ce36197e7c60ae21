import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Pallas-vs-dense parity AT HARNESS SCALE + per-step divergence probe.

The 300-gaussian smoke (tools/smoke_parity.py) pins kernel math to ~5e-7,
but the parity harness diverges at 480x352 with >10k gaussians (negative
photometric loss => renders blew past ~1e3 => either a scale-dependent
rasterizer/binning bug or genuine optimization explosion). This tool
separates the two:

  1. renders the harness's 23.6k-gaussian TRUE scene at 480x352 with the
     pallas backend vs the dense oracle (same device) and diffs;
  2. runs the harness's first 120 training iters in 1-step dispatches,
     printing loss/psnr/render-max/param extremes per step to find the
     divergence onset.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parity_harness import build_true_scene, ring_camera
    from semantic_gaussians_tpu.core.gaussians import init_from_pcd
    from semantic_gaussians_tpu.pipelines.train import (
        TrainConfig, init_train_state, train_loop,
    )
    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w
    from semantic_gaussians_tpu.utils.losses import psnr as psnr_fn

    rng = np.random.default_rng(11)
    w, h = 480, 352
    tpts, tcols = build_true_scene(rng)
    true_params, true_alive = init_from_pcd(tpts, tcols, sh_degree=3)
    cam = ring_camera(3.37, 8, w, h, radius=2.75, height=0.7,
                      make=make_camera_from_c2w)

    out_p = render(cam, true_params, true_alive, pair_budget=1_572_864)
    out_d = render(cam, true_params, true_alive, backend="dense")
    rp = np.clip(np.asarray(out_p["render"]), 0, 10)
    rd = np.clip(np.asarray(out_d["render"]), 0, 10)
    print(f"[scale parity] 23.6k gaussians 480x352: render max|d| "
          f"{np.abs(rp - rd).max():.3e}  overflow {int(out_p['overflow'])} "
          f"pairs {int(out_p['num_pairs'])}")
    dd = np.abs(np.asarray(out_p["depth"]) - np.asarray(out_d["depth"]))
    print(f"[scale parity] depth max|d| {dd.max():.3e}")

    # --- per-step divergence probe --------------------------------------
    n_train = 40
    gt = np.load(f"/tmp/parity_gt_{w}x{h}.npz")["gt"]
    import dataclasses as dc
    train_cams = []
    for i in range(n_train):
        c = ring_camera(i + 0.5 / n_train, n_train, w, h,
                        make=make_camera_from_c2w)
        train_cams.append(dc.replace(c, image=jnp.asarray(gt[i])))

    sel = np.arange(0, len(tpts), 2)
    init_cols = np.clip(
        tcols[sel] + rng.normal(0, 0.08, (len(sel), 3)), 0, 1
    ).astype(np.float32)
    params, alive = init_from_pcd(
        tpts[sel].astype(np.float32), init_cols, sh_degree=3, capacity=16384
    )
    state = init_train_state(params, alive)
    cfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    for it in range(12):
        state, hist = train_loop(
            state, train_cams, cfg, jax.random.fold_in(key, it),
            scene_extent=3.2, num_iters=10, log_every=10, iter_offset=it * 10,
            steps_per_dispatch=1, pair_budget=1_572_864, shuffle_seed=it * 10,
        )
        p = state.params
        stats = dict(
            max_op=float(jax.nn.sigmoid(p.opacity_logits).max()),
            max_scale=float(jnp.exp(p.log_scales).max()),
            max_xyz=float(jnp.abs(p.means).max()),
            max_shdc=float(jnp.abs(p.sh_dc).max()),
        )
        m = hist[-1][1]
        print(
            f"iter {(it+1)*10:4d}: loss {float(m['loss']):+.4f} "
            f"psnr {float(m['psnr']):6.2f} ov {int(m['overflow'])} "
            + " ".join(f"{k}={v:.3g}" for k, v in stats.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
