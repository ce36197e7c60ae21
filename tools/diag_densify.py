import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Diagnose the parity-harness PSNR drop after densification onset.

Loads the chunked-resume checkpoint, reports scene statistics (opacity /
scale / radii / pair-count distributions), renders a held-out view with a
GENEROUS pair budget vs the harness budget, and diffs against GT — to tell
apart (a) pair-budget overflow dropping splats, (b) runaway splat scales,
(c) opacity saturation, (d) a genuine optimization transient.
"""
import pickle

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.pipelines.train import init_train_state
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w
from semantic_gaussians_tpu.utils.checkpoint import load_state
from semantic_gaussians_tpu.utils.losses import psnr as psnr_fn

from parity_harness import build_true_scene, ring_camera

STATE = "/tmp/parity_state.pkl"


def main():
    rng = np.random.default_rng(11)
    w, h = 480, 352
    tpts, tcols = build_true_scene(rng)
    gt = np.load(f"/tmp/parity_gt_{w}x{h}.npz")["gt"]
    n_train, n_test = 40, 8
    test_cams = [
        ring_camera(i + 0.37, n_test, w, h, radius=2.75, height=0.7,
                    make=make_camera_from_c2w)
        for i in range(n_test)
    ]
    test_gt = gt[n_train:]

    sel = np.arange(0, len(tpts), 6)
    params, alive = init_from_pcd(
        tpts[sel].astype(np.float32),
        np.clip(tcols[sel] + rng.normal(0, 0.08, (len(sel), 3)), 0, 1).astype(np.float32),
        sh_degree=3, capacity=32768,
    )
    state = init_train_state(params, alive)
    blob = pickle.loads(pathlib.Path(STATE).read_bytes())
    print("curve:", blob["curve"])
    state = load_state(blob["state_path"], state)
    it_done = blob["it_done"]

    alive_np = np.asarray(state.alive)
    op = np.asarray(state.params.opacity)[alive_np, 0]
    sc = np.asarray(state.params.scales)[alive_np]
    mx = sc.max(-1)
    mean_np = np.asarray(state.params.means)[alive_np]
    print(f"iter {it_done}: alive {alive_np.sum()}")
    print("opacity quantiles", np.quantile(op, [0, 0.25, 0.5, 0.75, 0.99, 1.0]))
    print("maxscale quantiles", np.quantile(mx, [0, 0.25, 0.5, 0.75, 0.99, 1.0]))
    print("|mean| quantiles", np.quantile(np.linalg.norm(mean_np, axis=-1),
                                          [0, 0.5, 0.99, 1.0]))
    print("n opacity<0.005:", (op < 0.005).sum(), " n maxscale>0.32:", (mx > 0.32).sum())

    sh_deg = min(3, it_done // 1000)
    for budget, tag in [(1_572_864, "harness"), (6_291_456, "4x")]:
        vals, ovs, nps = [], [], []
        for cam, g in zip(test_cams, test_gt):
            out = render(cam, state.params, alive=state.alive,
                         active_sh_degree=sh_deg, pair_budget=budget)
            vals.append(float(psnr_fn(out["render"], jnp.asarray(g))))
            ovs.append(int(out["overflow"]))
            nps.append(int(out["num_pairs"]))
        print(f"[{tag} budget {budget}] PSNR per view",
              [f"{v:.2f}" for v in vals])
        print(f"  overflow {ovs}  num_pairs {nps}")

    # dump worst view as npz for offline look
    out = render(test_cams[0], state.params, alive=state.alive,
                 active_sh_degree=sh_deg, pair_budget=6_291_456)
    np.savez("/tmp/diag_view0.npz", pred=np.asarray(out["render"]),
             gt=test_gt[0])
    print("saved /tmp/diag_view0.npz")


if __name__ == "__main__":
    main()
