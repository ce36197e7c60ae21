"""Training-loop tests: optimizer, densify bookkeeping, PSNR improvement."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from semantic_gaussians_tpu.core.densify import DensifyConfig, DensifyState, densify_and_prune
from semantic_gaussians_tpu.core.gaussians import init_from_pcd, num_alive
from semantic_gaussians_tpu.core.optimizer import adam_init
from semantic_gaussians_tpu.pipelines.train import (
    TrainConfig,
    init_train_state,
    train_loop,
    train_step,
)
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.utils.losses import psnr


def _ring_cameras(n_cams, w=64, h=64, radius=6.0, image=None):
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        # camera at radius looking at origin
        pos = np.array([radius * np.sin(ang), 0.0, -radius * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd], axis=1)  # camera-to-world rotation
        t = -R.T @ pos
        cams.append(make_camera(R, t, 1.0, 1.0, w, h, image=image))
    return cams


def _toy_scene(seed=0, n=200):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, sh_degree=2, capacity=1024)


@pytest.mark.slow
def test_train_improves_psnr():
    gt_params, gt_alive = _toy_scene(seed=1)
    cams = _ring_cameras(4)
    # ground-truth images rendered from the target scene
    cams = [
        dataclasses.replace(
            c,
            image=render(c, gt_params, gt_alive, backend="dense")["render"],
        )
        for c in cams
    ]
    # student: same geometry, perturbed colors/opacity
    params, alive = _toy_scene(seed=1)
    params = dataclasses.replace(
        params,
        sh_dc=params.sh_dc + 0.8,
        opacity_logits=params.opacity_logits - 1.0,
    )
    state = init_train_state(params, alive)
    cfg = TrainConfig(densify_from_iter=10_000)  # no densify in this test

    def mean_psnr(p):
        vals = [
            float(psnr(render(c, p, alive, backend="dense")["render"], c.image))
            for c in cams
        ]
        return np.mean(vals)

    before = mean_psnr(state.params)
    state, _ = train_loop(
        state, cams, cfg, jax.random.PRNGKey(0), num_iters=60, backend="dense"
    )
    after = mean_psnr(state.params)
    assert after > before + 3.0, (before, after)


def test_train_step_metrics_finite():
    params, alive = _toy_scene()
    cams = _ring_cameras(1)
    cam = dataclasses.replace(
        cams[0], image=jnp.zeros((cams[0].height, cams[0].width, 3))
    )
    state = init_train_state(params, alive)
    state, metrics = train_step(
        state, cam, jnp.zeros(3), TrainConfig(), 0, backend="dense"
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["num_points"]) == 200
    assert int(state.step) == 1


def test_densify_clone_and_split():
    params, alive = _toy_scene(n=100)
    adam = adam_init(params)
    cap = params.capacity
    dstate = DensifyState(
        xyz_grad_accum=jnp.where(jnp.arange(cap) < 50, 1.0, 0.0),
        denom=jnp.ones(cap),
        max_radii2d=jnp.zeros(cap),
    )
    # make first 25 small (clone) and next 25 large (split)
    ls = np.full((cap, 3), -10.0, np.float32)
    ls[:25] = -8.0  # tiny -> clone
    ls[25:50] = 2.0  # huge -> split
    params = dataclasses.replace(params, log_scales=jnp.asarray(ls))
    cfg = DensifyConfig(grad_threshold=0.5, percent_dense=0.01)
    new_params, new_alive, new_adam, new_dstate, dropped = densify_and_prune(
        params, alive, adam, dstate, jax.random.PRNGKey(0), 1.0, cfg
    )
    # 100 alive; 25 cloned (+25), 25 split (-25 parents, +50 children)
    assert int(num_alive(new_alive)) == 100 + 25 - 25 + 50
    assert int(dropped) == 0
    # stats reset
    assert float(new_dstate.denom.sum()) == 0.0
    # moments of touched slots are zero: all mu finite
    assert np.isfinite(np.asarray(new_adam.mu.means)).all()


def test_densify_prune_low_opacity():
    params, alive = _toy_scene(n=100)
    adam = adam_init(params)
    logits = np.asarray(params.opacity_logits).copy()
    logits[:30] = -10.0  # opacity ~ 0 -> pruned
    params = dataclasses.replace(params, opacity_logits=jnp.asarray(logits))
    dstate = DensifyState.zeros(params.capacity)
    cfg = DensifyConfig(grad_threshold=1e9)
    new_params, new_alive, *_ = densify_and_prune(
        params, alive, adam, dstate, jax.random.PRNGKey(0), 1.0, cfg
    )
    assert int(num_alive(new_alive)) == 70


@pytest.mark.slow
def test_densify_capacity_overflow_reported():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, sh_degree=2, capacity=110)
    adam = adam_init(params)
    dstate = DensifyState(
        xyz_grad_accum=jnp.where(jnp.arange(params.capacity) < 50, 1.0, 0.0),
        denom=jnp.ones(params.capacity),
        max_radii2d=jnp.zeros(params.capacity),
    )
    ls = np.full((params.capacity, 3), -8.0, np.float32)  # all tiny -> clone
    params = dataclasses.replace(params, log_scales=jnp.asarray(ls))
    cfg = DensifyConfig(grad_threshold=0.5)
    *_, dropped = densify_and_prune(
        params, alive, adam, dstate, jax.random.PRNGKey(0), 1.0, cfg
    )
    assert int(dropped) == 40  # 50 clones into 10 free slots


@pytest.mark.slow
def test_scan_dispatch_matches_single_step_loop():
    """steps_per_dispatch=5 (lax.scan chunks) must produce the same training
    trajectory as the per-step dispatch loop (same camera order, same
    schedules, densify landing on identical chunk-end iterations)."""
    gt_params, gt_alive = _toy_scene(seed=2)
    cams = _ring_cameras(4)
    cams = [
        dataclasses.replace(
            c,
            image=render(c, gt_params, gt_alive, backend="dense")["render"],
        )
        for c in cams
    ]
    params, alive = _toy_scene(seed=2)
    params = dataclasses.replace(params, sh_dc=params.sh_dc + 0.5)
    cfg = TrainConfig(densify_from_iter=10, densification_interval=20)

    s1 = init_train_state(params, alive)
    s1, h1 = train_loop(
        s1, cams, cfg, jax.random.PRNGKey(0), num_iters=45, backend="dense",
        log_every=5,
    )
    s5 = init_train_state(params, alive)
    s5, h5 = train_loop(
        s5, cams, cfg, jax.random.PRNGKey(0), num_iters=45, backend="dense",
        log_every=5, steps_per_dispatch=5,
    )
    assert [it for it, _ in h1] == [it for it, _ in h5]
    # the scanned and per-step graphs fuse differently, so f32 rounding
    # drifts slightly across 45 steps — trajectory-level tolerance, but
    # densify decisions (alive set) must match exactly.
    for (it, m1), (_, m5) in zip(h1, h5):
        np.testing.assert_allclose(m1["loss"], m5["loss"], rtol=5e-3)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(s5.alive))
    # param-level: Adam's eps=1e-15 amplifies early nu rounding, so a few
    # elements drift ~1% over 45 steps; the trajectory (losses, alive set,
    # schedule landings) above is the real equivalence claim.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s5.params)):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2
        )


def test_tuned_pair_budget_ceiling():
    """Budgets clamp under binning's 2^24 f32-exact cumsum ceiling (the 5M
    @ 1080p config probes ~11M live pairs; 1.25x headroom must compress
    rather than trip binning.py's assert)."""
    from semantic_gaussians_tpu.pipelines.train import tuned_pair_budget

    assert tuned_pair_budget(100) == 8192
    assert tuned_pair_budget(300_000) == 393_216  # the headline budget
    cap = (1 << 24) - 8192
    assert tuned_pair_budget(15_000_000) == cap
    assert tuned_pair_budget(1 << 26) == cap
