"""Batched multi-view paths == per-view loops.

render_many (lax.map), the chunked eval scan (_eval_chunk) and the chunked
fusion scan (_fuse_chunk) amortize per-view dispatch; these tests pin that
they compute exactly what the per-view python loops compute, including the
zero-weight padding of ragged last chunks.
"""
import numpy as np
import jax.numpy as jnp

from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.models.predictors import RandomFeatureProvider
from semantic_gaussians_tpu.pipelines.eval_segmentation import eval_views
from semantic_gaussians_tpu.pipelines.fusion import FusionConfig, fuse_scene
from semantic_gaussians_tpu.pipelines.train import stack_camera_chunk
from semantic_gaussians_tpu.renderer import render, render_many
from semantic_gaussians_tpu.utils.camera import make_camera


def _toy(rng, n=90, cap=128):
    pts = (rng.normal(size=(n, 3)) * 0.3 + [0, 0, 3]).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, capacity=cap)


def _cams(k=5, w=64, h=48):
    return [
        make_camera(np.eye(3), np.array([0.08 * i, 0, 0]), 1.2, 1.0, w, h)
        for i in range(k)
    ]


def test_render_many_matches_per_view(rng):
    params, alive = _toy(rng)
    cams = _cams(3)
    stack = stack_camera_chunk(cams)
    outs = render_many(stack, params, alive=alive, backend="dense")
    for i, cam in enumerate(cams):
        ref = render(cam, params, alive=alive, backend="dense")
        np.testing.assert_allclose(
            np.asarray(outs["render"][i]), np.asarray(ref["render"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(outs["depth"][i]), np.asarray(ref["depth"]), atol=1e-6
        )


def test_fuse_scene_chunked_matches_loop(rng):
    params, alive = _toy(rng)
    cams = _cams(5)
    provider = RandomFeatureProvider(embedding_dim=6)
    paths = [f"v{i}" for i in range(5)]
    for depth in ("none", "render"):
        base = FusionConfig(
            img_dim=(64, 48), every_k_views=1, depth=depth, cut_boundary=0,
            visibility_threshold=0.5,
        )
        import dataclasses

        ref = fuse_scene(
            params, alive, cams, provider,
            dataclasses.replace(base, chunk_views=0),
            image_paths=paths, backend="dense",
        )
        # 5 views at chunk 2 -> two full chunks + one padded (zero-weight) one
        got = fuse_scene(
            params, alive, cams, provider,
            dataclasses.replace(base, chunk_views=2),
            image_paths=paths, backend="dense",
        )
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), atol=1e-6
        )


def test_fuse_scene_heterogeneous_cams_logs_fallback(rng, capsys):
    """Pod-readiness guard (VERDICT r2 weak #5): the silent loss of chunk
    amortization on mixed-camera scenes must announce itself."""
    params, alive = _toy(rng)
    cams = _cams(4) + [
        make_camera(np.eye(3), np.zeros(3), 1.2, 1.0, 32, 24)  # odd camera
    ]
    provider = RandomFeatureProvider(embedding_dim=6)
    fuse_scene(
        params, alive, cams, provider,
        FusionConfig(
            img_dim=(64, 48), every_k_views=1, depth="none", cut_boundary=0,
            chunk_views=2,
        ),
        image_paths=[f"v{i}" for i in range(5)], backend="dense",
    )
    assert "per-view dispatch" in capsys.readouterr().out


def test_eval_views_chunked_matches_loop(rng):
    params, alive = _toy(rng)
    cams = _cams(5)
    cap = params.capacity
    d, ncls = 7, 4
    gauss_feats = jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))
    text = rng.normal(size=(ncls + 1, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    gts = [
        rng.integers(0, ncls + 1, size=(48, 64)).astype(np.int64)
        for _ in range(5)
    ]
    labels = [f"c{i}" for i in range(ncls)]
    for pred_on_3d in (False, True):
        ref = eval_views(
            cams, gts, params, alive, gauss_feats, text, labels,
            pred_on_3d=pred_on_3d, backend="dense", chunk_views=0,
        )
        got = eval_views(
            cams, gts, params, alive, gauss_feats, text, labels,
            pred_on_3d=pred_on_3d, backend="dense", chunk_views=2,
        )
        np.testing.assert_array_equal(got[2], ref[2])
        assert got[0] == ref[0] and got[1] == ref[1]
