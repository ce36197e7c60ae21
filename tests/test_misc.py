"""Checkpoint round-trip, dynamic NPZ, viewer edits, logging, render options."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.io.dynamic_npz import load_dynamic_npz
from semantic_gaussians_tpu.pipelines.train import (
    TrainConfig,
    grow_capacity,
    init_train_state,
    train_step,
)
from semantic_gaussians_tpu.pipelines.viewer import apply_edit, render_view, select_by_text
from semantic_gaussians_tpu.models.predictors import RandomFeatureProvider
from semantic_gaussians_tpu.renderer import render
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.utils.checkpoint import (
    latest_iteration,
    load_state,
    save_state,
)


def _scene(n=100, seed=0, cap=128):
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n, 3)) * 0.4 + [0, 0, 3]).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, sh_degree=2, capacity=cap)


def test_checkpoint_roundtrip(tmp_path):
    params, alive = _scene()
    state = init_train_state(params, alive)
    cam = make_camera(
        np.eye(3), np.zeros(3), 1.2, 1.0, 64, 48,
        image=np.zeros((48, 64, 3), np.float32),
    )
    state, _ = train_step(state, cam, jnp.zeros(3), TrainConfig(), 0, backend="dense")
    save_state(tmp_path / "ckpt_1", state)
    restored = load_state(tmp_path / "ckpt_1", state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: another step runs from the restored state
    state2, m = train_step(
        restored, cam, jnp.zeros(3), TrainConfig(), 0, backend="dense"
    )
    assert int(state2.step) == 2 and np.isfinite(float(m["loss"]))


def test_latest_iteration(tmp_path):
    (tmp_path / "iteration_7000").mkdir()
    (tmp_path / "iteration_30000").mkdir()
    assert latest_iteration(tmp_path) == 30000
    assert latest_iteration(tmp_path / "nope") is None


def test_dynamic_npz(tmp_path, rng):
    t, n = 4, 50
    np.savez(
        tmp_path / "params.npz",
        means3D=rng.normal(size=(t, n, 3)).astype(np.float32),
        rgb_colors=rng.uniform(size=(t, n, 3)).astype(np.float32),
        unnorm_rotations=rng.normal(size=(t, n, 4)).astype(np.float32),
        logit_opacities=rng.normal(size=(n, 1)).astype(np.float32),
        log_scales=rng.normal(size=(n, 1)).astype(np.float32),
        seg_colors=rng.uniform(size=(n, 3)).astype(np.float32),
    )
    dyn = load_dynamic_npz(tmp_path / "params.npz")
    assert dyn.num_timesteps == 4
    p0, a0 = dyn.params_at(0)
    p1, _ = dyn.params_at(1)
    assert int(a0.sum()) == n
    assert not np.allclose(np.asarray(p0.means)[:n], np.asarray(p1.means)[:n])
    assert dyn.foreground_mask().shape[0] == dyn.capacity
    # renders
    cam = make_camera(np.eye(3), np.array([0, 0, 5]), 1.2, 1.0, 64, 48)
    out = render(cam, p0, a0, backend="dense")
    assert np.isfinite(np.asarray(out["render"])).all()


def test_viewer_edits(rng):
    params, alive = _scene()
    d = 8
    enc = RandomFeatureProvider(embedding_dim=d)
    text = enc.extract_text_feature(["other", "chair", "wall"])
    cls = rng.integers(0, 3, size=params.capacity)
    feats = jnp.asarray(text[cls])
    mask = select_by_text(feats, enc, ["chair"], ["wall"])
    assert int(mask.sum()) == int((cls == 1).sum())

    removed = apply_edit(params, mask, "Remove")
    assert float(removed.opacity[np.asarray(mask)].max()) < 1e-6
    colored = apply_edit(params, mask, "Color")
    moved = apply_edit(params, mask, "Move")
    np.testing.assert_allclose(
        np.asarray(moved.means)[np.asarray(mask)],
        np.asarray(params.means)[np.asarray(mask)] + 1.0,
    )
    sized = apply_edit(params, mask, "Size")
    np.testing.assert_allclose(
        np.asarray(sized.log_scales)[np.asarray(mask)],
        np.asarray(params.log_scales)[np.asarray(mask)] * 2.0,
    )


def test_viewer_render_modes(rng):
    params, alive = _scene()
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 1.0, 64, 48)
    enc = RandomFeatureProvider(embedding_dim=8)
    feats = jnp.asarray(rng.normal(size=(params.capacity, 8)).astype(np.float32))
    for mode in ("RGB", "Depth", "Semantic", "Relevancy"):
        img = render_view(
            cam, params, alive, mode=mode, gauss_feats=feats,
            text_encoder=enc, prompts=["chair", "wall"], backend="dense",
        )
        assert img.shape == (48, 64, 3) and img.dtype == np.uint8


def test_grow_capacity_preserves_state():
    params, alive = _scene(cap=128)
    state = init_train_state(params, alive)
    grown = grow_capacity(state)
    assert grown.params.capacity == 256
    assert int(grown.alive.sum()) == int(alive.sum())
    np.testing.assert_array_equal(
        np.asarray(grown.params.means)[:128], np.asarray(params.means)
    )
    assert float(grown.params.opacity_logits[128:].max()) == -20.0


def test_render_options(rng):
    """override_shape / scaling_modifier / foreground / world_rotate."""
    params, alive = _scene()
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 1.0, 64, 48)
    out = render(
        cam, params, alive, backend="dense", override_shape=(32, 24)
    )
    assert out["render"].shape == (24, 32, 3)
    out_small = render(
        cam, params, alive, backend="dense", scaling_modifier=0.5
    )
    out_base = render(cam, params, alive, backend="dense")
    assert not np.allclose(
        np.asarray(out_small["render"]), np.asarray(out_base["render"])
    )
    fg = jnp.zeros(params.capacity, bool)
    out_fg = render(cam, params, alive, backend="dense", foreground=fg)
    np.testing.assert_allclose(np.asarray(out_fg["render"]), 0.0, atol=1e-6)
    # identity world_rotate == base render
    out_rot = render(
        cam, params, alive, backend="dense", world_rotate=jnp.eye(3)
    )
    np.testing.assert_allclose(
        np.asarray(out_rot["render"]), np.asarray(out_base["render"]),
        atol=1e-4,
    )


@pytest.mark.slow
def test_logging_utils(tmp_path):
    from semantic_gaussians_tpu.utils.logging_utils import StepTimer, TBLogger

    tb = TBLogger(tmp_path / "tb")
    tb.scalar("a", 1.0, 0)
    tb.histogram("h", np.arange(10), 0)
    tb.image("i", np.zeros((4, 4, 3), np.float32), 0)
    tb.close()
    t = StepTimer()
    with t:
        pass
    assert t.value is not None and t.value >= 0


def test_debug_snapshot_works_under_jit(rng, tmp_path):
    """debug=True must work inside jit (the production paths are always
    jitted): finite renders pass through; a non-finite render dumps the
    input snapshot and errors (regression: TracerArrayConversionError)."""
    pts = rng.normal(size=(40, 3)).astype(np.float32) + [0, 0, 4]
    cols = rng.uniform(size=(40, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.9, 48, 32)

    @jax.jit
    def f(p):
        return render(cam, p, alive=alive, backend="dense", debug=True)[
            "render"
        ]

    assert np.isfinite(np.asarray(f(params))).all()

    import os

    snap = "/tmp/sgtpu_snapshot_fw.npz"
    if os.path.exists(snap):
        os.remove(snap)
    bad = dataclasses.replace(
        params, means=params.means.at[0, 0].set(jnp.nan)
    )
    with pytest.raises(Exception, match="non-finite render"):
        np.asarray(f(bad))
    assert os.path.exists(snap)
    dump = np.load(snap)
    assert "means" in dump and "world_view" in dump
