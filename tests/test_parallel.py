"""Multi-device tests on the 8-CPU-device mesh: view-DP step + band sharding."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.parallel.mesh import make_mesh
from semantic_gaussians_tpu.parallel.render_sharded import render_sharded
from semantic_gaussians_tpu.parallel.train_parallel import (
    make_parallel_train_step,
    stack_cameras,
)
from semantic_gaussians_tpu.pipelines.train import TrainConfig, init_train_state
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n, 3)) * 0.5 + [0, 0, 4]).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, sh_degree=2, capacity=256)
    # Random orientations + anisotropic scales: identity quats on isotropic
    # splats have mathematically ZERO rotation gradient, so grad-parity
    # checks would compare rounding noise against rounding noise.
    params = dataclasses.replace(
        params,
        quats=jnp.asarray(rng.normal(size=params.quats.shape).astype(np.float32)),
        log_scales=params.log_scales
        + jnp.asarray(
            rng.uniform(-0.8, 0.8, size=params.log_scales.shape).astype(
                np.float32
            )
        ),
    )
    return params, alive


@pytest.mark.slow
def test_band_sharded_matches_single_device():
    params, alive = _scene()
    # interpret-mode pallas scales with tile count: a 64x32 image on a
    # 4-device mesh (2 one-tile-row bands + 2 empty bands) keeps every
    # code path — band split, empty-band devices, depth/overflow merge —
    # at a quarter of the old 128x64/8-device wall time
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 64, 32)
    mesh = make_mesh(4)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    out_s = render_sharded(cam, params, alive, mesh, bg)
    out_1 = render(cam, params, alive, bg=bg, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(out_s["render"]), np.asarray(out_1["render"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["depth"]), np.asarray(out_1["depth"]),
        rtol=1e-4, atol=1e-4,
    )
    assert int(out_s["overflow"]) == 0


@pytest.mark.slow
def test_band_sharded_gradients_psum():
    params, alive = _scene(n=150)
    # small image: interpret-mode pallas EXECUTION dominates this test (the
    # cost is per-tile python-level kernel emulation, not shards — mesh 2
    # vs 8 measures identical), so shrink pixels, keep the 4-way band split
    # (2 non-empty bands + 2 empty-band devices)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 64, 32)
    mesh = make_mesh(4)
    key = jax.random.PRNGKey(0)
    wimg = jax.random.uniform(key, (32, 64, 3))

    def loss_sharded(p):
        return jnp.sum(render_sharded(cam, p, alive, mesh)["render"] * wimg)

    def loss_single(p):
        return jnp.sum(
            render(cam, p, alive, backend="pallas")["render"] * wimg
        )

    g_s = jax.grad(loss_sharded)(params)
    g_1 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_1)):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-3
        )


def test_view_parallel_step_runs():
    params, alive = _scene()
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    cams = [
        make_camera(
            np.eye(3), np.array([0.05 * i, 0, 0]), 1.2, 0.9, 128, 32,
            image=rng.uniform(size=(32, 128, 3)).astype(np.float32),
        )
        for i in range(8)
    ]
    state = init_train_state(params, alive)
    step = make_parallel_train_step(mesh, TrainConfig(), active_sh_degree=1)
    state, metrics = step(state, stack_cameras(cams), jnp.zeros(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_view_parallel_step_rejects_short_cam_batch():
    """Pod-readiness guard: fewer stacked views than mesh devices must fail
    with a clear Python error, not an opaque XLA sharding error."""
    params, alive = _scene()
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    cams = [
        make_camera(
            np.eye(3), np.array([0.05 * i, 0, 0]), 1.2, 0.9, 128, 32,
            image=rng.uniform(size=(32, 128, 3)).astype(np.float32),
        )
        for i in range(5)  # < 8 devices
    ]
    state = init_train_state(params, alive)
    step = make_parallel_train_step(mesh, TrainConfig(), active_sh_degree=1)
    with pytest.raises(ValueError, match="5 views.*8 devices"):
        step(state, stack_cameras(cams), jnp.zeros(3))


@pytest.mark.slow
def test_parallel_distill_step():
    from semantic_gaussians_tpu.pipelines.distill import (
        DistillConfig,
        FeatureDataset,
        make_distill_state,
        make_parallel_distill_step,
        stack_items,
    )
    from semantic_gaussians_tpu.data.feature_dataset import DistillItem

    rng = np.random.default_rng(0)
    cfg = DistillConfig(model_3d="MinkUNet14A", feature_dim=8, in_channels=4)
    budget = 128
    model, variables, tx, opt_state = make_distill_state(cfg, budget, 1)
    mesh = make_mesh(8)
    step = make_parallel_distill_step(model, tx, cfg, mesh)

    items = []
    for i in range(8):
        n = 60
        items.append(
            DistillItem(
                coords=np.pad(
                    rng.integers(0, 16, size=(n, 3)).astype(np.int32),
                    ((0, budget - n), (0, 0)),
                ),
                feats=np.pad(
                    rng.normal(size=(n, 4)).astype(np.float32),
                    ((0, budget - n), (0, 0)),
                ),
                gt=np.pad(
                    rng.normal(size=(n, 8)).astype(np.float32),
                    ((0, budget - n), (0, 0)),
                ),
                gt_mask=np.arange(budget) < n,
                mask=np.arange(budget) < n,
                num_voxels=n,
            )
        )
    batch = stack_items(items)
    variables, opt_state, loss = step(variables, opt_state, *batch)
    assert np.isfinite(float(loss))


def test_empty_scene_renders_background():
    params, alive = _scene(n=10)
    alive = jnp.zeros_like(alive)  # nothing alive
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 128, 32)
    bg = jnp.asarray([0.5, 0.25, 0.75])
    out = render(cam, params, alive, bg=bg, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(out["render"]),
        np.broadcast_to(np.asarray(bg), (32, 128, 3)),
        atol=1e-6,
    )
    assert float(out["depth"].min()) == 15.0  # median-depth init everywhere


@pytest.mark.slow
def test_hybrid_step_matches_view_dp():
    """Hybrid (view x band) step == view-DP step on the same views: same
    parameter update and same densify stats (band sharding is numerically
    transparent; view semantics match make_parallel_train_step)."""
    from semantic_gaussians_tpu.parallel.train_parallel import (
        make_hybrid_train_step,
    )
    from semantic_gaussians_tpu.parallel.multihost import make_view_band_mesh

    params, alive = _scene(n=180, seed=5)
    rng = np.random.default_rng(11)
    H, W = 64, 128
    cams = [
        make_camera(
            np.eye(3), np.array([0.05 * i, 0, 0]), 1.2, 0.9, W, H,
            image=rng.uniform(size=(H, W, 3)).astype(np.float32),
        )
        for i in range(2)
    ]
    cfg = TrainConfig()
    bg = jnp.zeros(3)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh_hybrid = jax.sharding.Mesh(devs, ("view", "band"))
    mesh_dp = make_mesh(2)

    state_h = init_train_state(params, alive)
    state_d = init_train_state(params, alive)
    hybrid = make_hybrid_train_step(
        mesh_hybrid, cfg, active_sh_degree=1, img_height=H, img_width=W
    )
    dp = make_parallel_train_step(mesh_dp, cfg, active_sh_degree=1)
    batch = stack_cameras(cams)
    for _ in range(2):
        state_h, mh = hybrid(state_h, batch, bg)
        state_d, md = dp(state_d, batch, bg)

    assert abs(float(mh["loss"]) - float(md["loss"])) < 2e-4
    for a, b in zip(
        jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
    np.testing.assert_array_equal(
        np.asarray(state_h.dstate.denom), np.asarray(state_d.dstate.denom)
    )
    acc_h = np.asarray(state_h.dstate.xyz_grad_accum)
    acc_d = np.asarray(state_d.dstate.xyz_grad_accum)
    scale = acc_d.max() + 1e-12
    np.testing.assert_allclose(acc_h / scale, acc_d / scale, atol=2e-3)


def test_multihost_helpers_single_process():
    from semantic_gaussians_tpu.parallel import multihost

    assert multihost.is_primary()
    mesh = multihost.make_view_band_mesh()
    assert mesh.shape["view"] == 1 and mesh.shape["band"] == len(jax.devices())
    mesh1 = multihost.make_data_mesh()
    assert mesh1.shape["data"] == len(jax.devices())
    # global batch from local (single-process: device_put path)
    tree = {"x": np.ones((1, 4), np.float32)}
    out = multihost.global_batch_from_local(tree, mesh, "view")
    assert out["x"].shape == (1, 4)


@pytest.mark.slow
def test_multihost_launch_rehearsal():
    """2-process x 4-CPU-device rehearsal of the real jax.distributed launch
    path (coordinator + global mesh + hybrid step)."""
    import subprocess, sys, pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable, str(repo / "tools" / "launch_multihost.py"),
            "--procs", "2", "--local-devices", "4", "--steps", "1",
        ],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "multihost rehearsal OK" in r.stdout


@pytest.mark.slow
def test_band_train_step_densify_stats_match_single_chip():
    """Band-sharded training must drive the SAME densify decisions as a
    single chip: the replicated mean2d_offset's cotangent is psum'd over
    bands by the shard_map transpose, so accumulated norms / visibility
    counts / max radii agree with the unsharded step (ref train.py:156-161,
    gaussian_model.py:608-612)."""
    from semantic_gaussians_tpu.parallel.train_parallel import (
        make_band_train_step,
    )
    from semantic_gaussians_tpu.pipelines.train import train_step

    params, alive = _scene(n=180, seed=3)
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(64, 128, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 128, 64, image=img)
    mesh = make_mesh(8)
    cfg = TrainConfig()
    bg = jnp.zeros(3)

    state_b = init_train_state(params, alive)
    state_1 = init_train_state(params, alive)
    band_step = make_band_train_step(mesh, cfg, active_sh_degree=1)
    for _ in range(2):
        state_b, _ = band_step(state_b, cam, bg)
        state_1, _ = train_step(state_1, cam, bg, cfg, active_sh_degree=1)

    # Visibility and max-radii decisions must be exact; accumulated norms
    # agree to float tolerance (band grads sum in a different order).
    np.testing.assert_array_equal(
        np.asarray(state_b.dstate.denom), np.asarray(state_1.dstate.denom)
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.dstate.max_radii2d),
        np.asarray(state_1.dstate.max_radii2d),
    )
    acc_b = np.asarray(state_b.dstate.xyz_grad_accum)
    acc_1 = np.asarray(state_1.dstate.xyz_grad_accum)
    scale = acc_1.max() + 1e-12
    np.testing.assert_allclose(acc_b / scale, acc_1 / scale, atol=2e-3)

    # The densify trigger mask (accum/denom > threshold) must agree.
    from semantic_gaussians_tpu.core.densify import DensifyConfig

    dcfg = DensifyConfig()
    trig_b = (acc_b / np.maximum(np.asarray(state_b.dstate.denom), 1)) > dcfg.grad_threshold
    trig_1 = (acc_1 / np.maximum(np.asarray(state_1.dstate.denom), 1)) > dcfg.grad_threshold
    np.testing.assert_array_equal(trig_b, trig_1)


@pytest.mark.slow
def test_band_zero_step_matches_replicated_band_step():
    """The reduce-scatter + sharded-Adam band step (ZeRO recipe) must march
    in lockstep with the replicated-Adam band step: same params, same adam
    moments (modulo cross-band summation order), same densify stats."""
    from semantic_gaussians_tpu.parallel.train_parallel import (
        make_band_train_step,
        make_band_train_step_zero,
    )

    params, alive = _scene(n=180, seed=3)
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(64, 128, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 128, 64, image=img)
    mesh = make_mesh(8)
    cfg = TrainConfig()
    bg = jnp.zeros(3)

    state_z = init_train_state(params, alive)
    state_b = init_train_state(params, alive)
    zero_step = make_band_train_step_zero(
        mesh, cfg, active_sh_degree=1, img_height=64, img_width=128
    )
    band_step = make_band_train_step(mesh, cfg, active_sh_degree=1)
    for _ in range(3):
        state_z, mz = zero_step(state_z, cam, bg)
        state_b, mb = band_step(state_b, cam, bg)

    np.testing.assert_allclose(float(mz["loss"]), float(mb["loss"]), rtol=1e-5)
    assert int(state_z.adam.count) == 3 and int(state_z.step) == 3
    for a, b in zip(
        jax.tree.leaves(state_z.params), jax.tree.leaves(state_b.params)
    ):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4
        )
    for a, b in zip(
        jax.tree.leaves(state_z.adam.mu), jax.tree.leaves(state_b.adam.mu)
    ):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4
        )
    acc_z = np.asarray(state_z.dstate.xyz_grad_accum)
    acc_b = np.asarray(state_b.dstate.xyz_grad_accum)
    scale = acc_b.max() + 1e-12
    np.testing.assert_allclose(acc_z / scale, acc_b / scale, atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(state_z.dstate.denom), np.asarray(state_b.dstate.denom)
    )


@pytest.mark.slow
def test_hybrid_zero_step_matches_hybrid_step():
    """ZeRO hybrid (band reduce-scatter + view psum + sharded Adam) marches
    in lockstep with the replicated-Adam hybrid step on a 2x4 mesh."""
    from semantic_gaussians_tpu.parallel.train_parallel import (
        make_hybrid_train_step,
        make_hybrid_train_step_zero,
    )

    params, alive = _scene(n=160, seed=5)
    rng = np.random.default_rng(9)
    h, w = 64, 128
    cams = [
        make_camera(
            np.eye(3), np.array([0.06 * i, 0, 0]), 1.2, 0.9, w, h,
            image=rng.uniform(size=(h, w, 3)).astype(np.float32),
        )
        for i in range(2)
    ]
    cam_batch = stack_cameras(cams)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("view", "band"))
    cfg = TrainConfig()
    bg = jnp.zeros(3)

    state_z = init_train_state(params, alive)
    state_h = init_train_state(params, alive)
    zero_step = make_hybrid_train_step_zero(
        mesh, cfg, active_sh_degree=1, img_height=h, img_width=w
    )
    hybrid_step = make_hybrid_train_step(
        mesh, cfg, active_sh_degree=1, img_height=h, img_width=w
    )
    for _ in range(2):
        state_z, mz = zero_step(state_z, cam_batch, bg)
        state_h, mh = hybrid_step(state_h, cam_batch, bg)

    np.testing.assert_allclose(float(mz["loss"]), float(mh["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(state_z.params), jax.tree.leaves(state_h.params)
    ):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4
        )
    acc_z = np.asarray(state_z.dstate.xyz_grad_accum)
    acc_h = np.asarray(state_h.dstate.xyz_grad_accum)
    scale = acc_h.max() + 1e-12
    np.testing.assert_allclose(acc_z / scale, acc_h / scale, atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(state_z.dstate.denom), np.asarray(state_h.dstate.denom)
    )


@pytest.mark.slow
def test_hybrid_train_loop_protocol():
    """hybrid_train_loop runs the full protocol (SH warmup step-fn rebuild,
    densify, opacity reset) on a 2x4 mesh and improves the loss."""
    from semantic_gaussians_tpu.parallel.train_parallel import (
        hybrid_train_loop,
    )

    params, alive = _scene(n=150, seed=8)
    rng = np.random.default_rng(3)
    h, w = 64, 128
    cams = [
        make_camera(
            np.eye(3), np.array([0.04 * i, 0, 0]), 1.2, 0.9, w, h,
            image=rng.uniform(size=(h, w, 3)).astype(np.float32),
        )
        for i in range(4)
    ]
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("view", "band"))
    cfg = dataclasses.replace(
        TrainConfig(),
        densify_from_iter=4,
        densification_interval=6,
        opacity_reset_interval=18,
    )
    state = init_train_state(params, alive)
    state, hist = hybrid_train_loop(
        state, cams, cfg, jax.random.PRNGKey(0), mesh, scene_extent=2.0,
        num_iters=24, log_every=6,
    )
    assert int(state.step) == 24
    assert len(hist) == 4
    assert np.isfinite(hist[-1][1]["loss"])
    # opacity reset landed at iter 18
    mx = float(np.asarray(state.params.opacity)[np.asarray(state.alive)].max())
    assert mx < 0.5  # reset at 18, only 6 recovery steps


@pytest.mark.slow
def test_parallel_fuse_step_matches_serial():
    """View-parallel fusion (one view per chip, psum'd deltas) must match
    the serial per-view fuse_view accumulation exactly."""
    from semantic_gaussians_tpu.pipelines.fusion import (
        _intrinsic_for,
        fuse_view,
        make_parallel_fuse_step,
    )
    from semantic_gaussians_tpu.pipelines.train import stack_camera_chunk
    from semantic_gaussians_tpu.renderer import render as render_fn

    rng = np.random.default_rng(5)
    params, alive = _scene(n=150, seed=5)
    n_dev, c = 8, 16
    w, h = 48, 32
    cams = [
        make_camera(
            np.eye(3), np.array([0.07 * i - 0.25, 0, 0]), 1.2, 0.9, w, h
        )
        for i in range(n_dev)
    ]
    feats = rng.normal(size=(n_dev, h, w, c)).astype(np.float32)
    img_dim = (w, h)
    intr = np.stack([_intrinsic_for(cam, img_dim) for cam in cams])
    weights = np.ones(n_dev, np.float32)
    weights[-1] = 0.0  # one padded slot exercises the view gate

    mesh = make_mesh(n_dev)
    step = make_parallel_fuse_step(
        mesh, img_dim, vis_thres=0.1, cut_bound=1, depth_mode="render",
        backend="dense",
    )
    sem0 = jnp.zeros((params.capacity, c))
    cnt0 = jnp.zeros((params.capacity,))
    sem_p, cnt_p = step(
        sem0, cnt0, params, alive, stack_camera_chunk(cams),
        jnp.asarray(intr), jnp.asarray(feats), jnp.asarray(weights),
    )

    sem_s, cnt_s = sem0, cnt0
    for i in range(n_dev):
        if weights[i] == 0.0:
            continue
        depth = render_fn(
            cams[i], params, alive=alive, override_shape=img_dim,
            backend="dense",
        )["depth"]
        sem_s, cnt_s = fuse_view(
            sem_s, cnt_s, params.means, alive, cams[i].world_view,
            jnp.asarray(intr[i]), jnp.asarray(feats[i]), depth, img_dim,
            0.1, 1,
        )
    assert int(np.asarray(cnt_s > 0).sum()) > 20  # fusion actually hit
    np.testing.assert_allclose(
        np.asarray(cnt_p), np.asarray(cnt_s), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(sem_p), np.asarray(sem_s), rtol=1e-6, atol=1e-6
    )
