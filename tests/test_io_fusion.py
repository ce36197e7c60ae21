"""Tests: PLY round-trips, config overrides, fusion mapping, voxelizer."""
import dataclasses
import math

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_gaussians_tpu.config.config import DotDict, load_yaml, merge_dotlist
from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.data.fusion_utils import (
    Voxelizer,
    adjust_intrinsic,
    compute_mapping,
    surface_depth,
)
from semantic_gaussians_tpu.io.ply import (
    load_gaussian_ply,
    load_point_cloud,
    save_gaussian_ply,
    save_point_cloud,
)
from semantic_gaussians_tpu.pipelines.fusion import (
    FusionConfig,
    fuse_scene,
    load_fused_features,
    save_fused_features,
)
from semantic_gaussians_tpu.models.predictors import RandomFeatureProvider
from semantic_gaussians_tpu.utils.camera import make_camera


def test_gaussian_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, sh_degree=3, capacity=64)
    p = tmp_path / "point_cloud.ply"
    save_gaussian_ply(p, params, np.asarray(alive))
    params2, alive2 = load_gaussian_ply(p, capacity=64)
    assert int(alive2.sum()) == 50
    np.testing.assert_allclose(
        np.asarray(params2.means)[:50], pts, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params2.sh_dc)[:50], np.asarray(params.sh_dc)[:50], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params2.sh_rest)[:50],
        np.asarray(params.sh_rest)[:50],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params2.quats)[:50], np.asarray(params.quats)[:50], atol=1e-6
    )


def test_pointcloud_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.uniform(size=(30, 3)).astype(np.float32)
    p = tmp_path / "points3d.ply"
    save_point_cloud(p, pts, cols)
    pts2, cols2, _ = load_point_cloud(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0 + 1e-6)


def test_config_dotlist(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("train:\n  lr: 0.1\n  iters: 100\nscene:\n  path: /x\n")
    cfg = load_yaml(y)
    cfg2 = merge_dotlist(cfg, ["train.lr=0.5", "scene.name=foo", "train.flag=true"])
    assert cfg2.train.lr == 0.5
    assert cfg2.train.iters == 100
    assert cfg2.scene.name == "foo"
    assert cfg2.train.flag is True
    assert cfg.train.lr == 0.1  # original untouched


def test_compute_mapping_occlusion():
    # one point at z=2 in front of camera; depth map agrees -> visible
    coords = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])
    w2c = jnp.eye(4)
    K = jnp.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)
    m = compute_mapping(w2c, coords, K, (64, 48), depth, 0.05, 0)
    m = np.asarray(m)
    assert m[0].tolist() == [24, 32, 1]
    assert m[1, 2] == 0  # behind camera
    # depth mismatch -> occluded
    m2 = np.asarray(
        compute_mapping(w2c, coords, K, (64, 48), depth * 0.5, 0.05, 0)
    )
    assert m2[0, 2] == 0
    # no depth -> visible
    m3 = np.asarray(compute_mapping(w2c, coords, K, (64, 48), None, 0.05, 0))
    assert m3[0, 2] == 1
    # cut_bound excludes border pixels
    m4 = np.asarray(compute_mapping(w2c, coords, K, (64, 48), None, 0.05, 30))
    assert m4[0, 2] == 0


def test_surface_depth_zbuffer():
    coords = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0], [0.5, 0.0, 2.0]])
    w2c = jnp.eye(4)
    K = jnp.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
    zb = np.asarray(surface_depth(w2c, coords, K, (64, 48)))
    assert zb[24, 32] == 2.0  # min of 2 and 4


def test_fuse_scene_and_checkpoint(tmp_path, rng):
    pts = (rng.normal(size=(100, 3)) * 0.3 + [0, 0, 3]).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=128)
    cams = [
        make_camera(np.eye(3), np.array([0.1 * i, 0, 0]), 1.2, 1.0, 64, 48)
        for i in range(3)
    ]
    provider = RandomFeatureProvider(embedding_dim=8)
    cfg = FusionConfig(
        img_dim=(64, 48), every_k_views=1, depth="none", cut_boundary=0
    )
    feats, visited = fuse_scene(
        params, alive, cams, provider, cfg,
        image_paths=[f"v{i}" for i in range(3)], backend="dense",
    )
    assert int(visited.sum()) > 50
    assert np.isfinite(np.asarray(feats)).all()
    # dead padding never visited
    assert not np.asarray(visited)[100:].any()

    p = tmp_path / "0.pt"
    save_fused_features(p, np.asarray(feats), np.asarray(visited))
    feats2, mask2 = load_fused_features(p, capacity=128)
    np.testing.assert_array_equal(np.asarray(mask2), np.asarray(visited))
    np.testing.assert_allclose(
        np.asarray(feats2)[np.asarray(visited)],
        np.asarray(feats)[np.asarray(visited)],
        atol=2e-3,  # fp16 storage
    )


def test_fuse_scene_half_feature_maps(rng):
    """feat_dtype=float16 (the reference's stored 2D-feature precision,
    fusion.py:241) matches f32 fusion within fp16 rounding; counts exact."""
    pts = (rng.normal(size=(100, 3)) * 0.3 + [0, 0, 3]).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=128)
    cams = [
        make_camera(np.eye(3), np.array([0.1 * i, 0, 0]), 1.2, 1.0, 64, 48)
        for i in range(3)
    ]
    provider = RandomFeatureProvider(embedding_dim=8)
    paths = [f"v{i}" for i in range(3)]
    outs = {}
    for dt in ("float32", "float16"):
        cfg = FusionConfig(
            img_dim=(64, 48), every_k_views=1, depth="none", cut_boundary=0,
            feat_dtype=dt,
        )
        outs[dt] = fuse_scene(
            params, alive, cams, provider, cfg, image_paths=paths,
            backend="dense",
        )
    f32, v32 = outs["float32"]
    f16, v16 = outs["float16"]
    np.testing.assert_array_equal(np.asarray(v32), np.asarray(v16))
    assert np.asarray(f16).dtype == np.float32  # accumulation stays f32
    np.testing.assert_allclose(
        np.asarray(f16), np.asarray(f32), atol=2e-3
    )


def test_fusion_depth_render_mode(rng):
    pts = (rng.normal(size=(80, 3)) * 0.3 + [0, 0, 3]).astype(np.float32)
    cols = rng.uniform(size=(80, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=128)
    cams = [make_camera(np.eye(3), np.zeros(3), 1.2, 1.0, 64, 48)]
    provider = RandomFeatureProvider(embedding_dim=4)
    cfg = FusionConfig(
        img_dim=(64, 48), every_k_views=1, depth="render",
        visibility_threshold=0.5, cut_boundary=0,
    )
    feats, visited = fuse_scene(
        params, alive, cams, provider, cfg, image_paths=["v0"],
        backend="dense",
    )
    assert int(visited.sum()) > 0


def test_voxelizer_dedupe():
    coords = np.array(
        [[0.0, 0.0, 0.0], [0.004, 0.0, 0.0], [0.1, 0.0, 0.0]]
    )
    feats = np.arange(3)[:, None].astype(np.float32)
    vox = Voxelizer(voxel_size=0.02)
    vc, vf, _, inverse, first_idx = vox.voxelize(coords, feats)
    assert len(vc) == 2  # first two share a voxel
    assert inverse.shape == (3,)
    np.testing.assert_array_equal(inverse[0], inverse[1])


def test_adjust_intrinsic():
    K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]])
    K2 = adjust_intrinsic(K, (100, 80), (50, 40))
    assert K2[0, 0] == 50.0 and K2[1, 1] == 50.0


def test_chromatic_augmentations(rng):
    from semantic_gaussians_tpu.data.augmentation import (
        ChromaticAutoContrast,
        ChromaticJitter,
        ChromaticTranslation,
        HueSaturationTranslation,
    )

    coords = rng.normal(size=(50, 3))
    feats = rng.uniform(0, 255, size=(50, 6)).astype(np.float32)
    for aug in (
        ChromaticTranslation(),
        ChromaticAutoContrast(),
        ChromaticJitter(),
        HueSaturationTranslation(),
    ):
        _, f2, _ = aug(coords, feats.copy(), seed=0)
        assert f2.shape == feats.shape
        assert (f2[:, :3] >= -1e-3).all() and (f2[:, :3] <= 255 + 1e-3).all()
        np.testing.assert_array_equal(f2[:, 3:], feats[:, 3:])  # non-color cols


def test_hsv_roundtrip(rng):
    from semantic_gaussians_tpu.data.augmentation import HueSaturationTranslation

    rgb = rng.uniform(0, 255, size=(100, 3))
    hsv = HueSaturationTranslation.rgb_to_hsv(rgb)
    back = HueSaturationTranslation.hsv_to_rgb(hsv)
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_mark_visible():
    from semantic_gaussians_tpu.ops.projection import mark_visible
    from semantic_gaussians_tpu.utils.camera import make_camera

    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 1.0, 64, 48)
    pts = jnp.asarray(
        [[0, 0, 3.0], [0, 0, -3.0], [100.0, 0, 3.0], [0, 0, 0.1]]
    )
    vis = np.asarray(mark_visible(pts, cam.world_view, cam.full_proj))
    assert vis.tolist() == [True, False, False, False]


def test_render_palette():
    from semantic_gaussians_tpu.data.scannet_constants import render_palette

    lbl = np.array([[0, 1], [19, 5]])
    img = render_palette(lbl, 19)
    assert img.shape == (2, 2, 3)
    assert (img[1, 0] == 0).all()  # unlabeled -> black
    assert img.max() <= 1.0
