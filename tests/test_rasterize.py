"""Tiled Pallas rasterizer vs dense oracle: forward + gradient parity.

The oracle (composite_ref) restates the CUDA compositing semantics in pure
JAX with autodiff; the tiled path must match it to ~1e-4 forward and ~1e-3
gradient (SURVEY.md §4 kernel-level strategy).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_gaussians_tpu.ops.projection import project_gaussians
from semantic_gaussians_tpu.ops.rasterize import rasterize
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.utils.sh import rgb_to_sh

W, H = 256, 64  # grid 2x8 with (8,128) tiles
TILE = (8, 128)


def make_scene(n=300, num_ch=None, seed=0, opacity_max=0.9):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.2, 0.45, 0.8], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(-3.2, -1.8, size=(n, 3))).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(
        rng.uniform(0.2, opacity_max, size=(n,)).astype(np.float32)
    )
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 0.5, W, H)
    if num_ch is None:
        k = 16
        sh = np.zeros((n, k, 3), np.float32)
        sh[:, 0] = np.asarray(rgb_to_sh(rng.uniform(size=(n, 3)).astype(np.float32)))
        sh[:, 1:] = rng.normal(size=(n, k - 1, 3)) * 0.02
        colors = dict(sh_coeffs=jnp.asarray(sh), sh_degree=3)
    else:
        colors = dict(
            override_color=jnp.asarray(
                rng.uniform(size=(n, num_ch)).astype(np.float32)
            )
        )
    return dict(
        means=jnp.asarray(means), scales=scales, quats=quats, opac=opac,
        cam=cam, colors=colors,
    )


def project(s, means=None, scales=None, quats=None, opac=None, colors=None):
    cam = s["cam"]
    return project_gaussians(
        s["means"] if means is None else means,
        s["scales"] if scales is None else scales,
        s["quats"] if quats is None else quats,
        s["opac"] if opac is None else opac,
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
        **(s["colors"] if colors is None else colors),
    )


def test_forward_matches_oracle():
    s = make_scene()
    proj = project(s)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    tiled = rasterize(proj, bg, W, H, TILE, backend="pallas")
    dense = rasterize(proj, bg, W, H, TILE, backend="dense")
    assert int(tiled["overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(tiled["render"]), np.asarray(dense["render"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled["final_T"]), np.asarray(dense["final_T"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled["depth"]), np.asarray(dense["depth"]),
        rtol=1e-4, atol=1e-4,
    )
    # n_contrib is the 1-based per-tile walk index of the LAST contributor
    # (CUDA last_contributor semantics) on both backends
    np.testing.assert_array_equal(
        np.asarray(tiled["n_contrib"]), np.asarray(dense["n_contrib"])
    )


def test_forward_nontrivial():
    s = make_scene()
    proj = project(s)
    out = rasterize(proj, jnp.zeros(3), W, H, TILE, backend="pallas")
    img = np.asarray(out["render"])
    assert img.shape == (H, W, 3)
    assert (np.asarray(out["final_T"]) < 0.5).sum() > 50  # dense coverage
    assert np.isfinite(img).all()


def test_tile_shape_none_uses_default():
    # Pipeline CLIs pass tile_shape=None for "library default"; the pallas
    # path must not unpack None (regression: eval/fusion CLI crash).
    s = make_scene()
    proj = project(s)
    bg = jnp.zeros(3)
    out_none = rasterize(proj, bg, W, H, None, backend="pallas")
    out_def = rasterize(proj, bg, W, H, backend="pallas")
    np.testing.assert_array_equal(
        np.asarray(out_none["render"]), np.asarray(out_def["render"])
    )


@pytest.mark.parametrize("wrt", ["means", "scales", "quats", "opac", "color"])
def test_gradients_match_oracle(wrt):
    s = make_scene(n=200)
    key = jax.random.PRNGKey(1)
    wimg = jax.random.uniform(key, (H, W, 3))
    bg = jnp.asarray([0.3, 0.1, 0.2])

    def loss(x, backend):
        kw = {}
        if wrt == "color":
            sh = s["colors"]["sh_coeffs"].at[:, 0].set(x)
            kw["colors"] = dict(sh_coeffs=sh, sh_degree=3)
        else:
            kw[{"means": "means", "scales": "scales", "quats": "quats",
                "opac": "opac"}[wrt]] = x
        proj = project(s, **kw)
        out = rasterize(proj, bg, W, H, TILE, backend=backend)
        return jnp.sum(out["render"] * wimg)

    x0 = {
        "means": s["means"], "scales": s["scales"], "quats": s["quats"],
        "opac": s["opac"], "color": s["colors"]["sh_coeffs"][:, 0],
    }[wrt]
    g_tiled = np.asarray(jax.grad(lambda x: loss(x, "pallas"))(x0))
    g_dense = np.asarray(jax.grad(lambda x: loss(x, "dense"))(x0))
    assert np.isfinite(g_tiled).all()
    scale = np.abs(g_dense).max() + 1e-8
    np.testing.assert_allclose(
        g_tiled / scale, g_dense / scale, atol=2e-3,
    )


def test_nchannel_forward_and_grad():
    num_ch = 8
    s = make_scene(n=150, num_ch=num_ch)
    bg = jnp.zeros(num_ch)

    def loss(feats, backend):
        proj = project(s, colors=dict(override_color=feats))
        out = rasterize(proj, bg, W, H, TILE, backend=backend)
        return jnp.sum(out["render"] ** 2)

    feats = s["colors"]["override_color"]
    f_t = float(loss(feats, "pallas"))
    f_d = float(loss(feats, "dense"))
    assert f_t == pytest.approx(f_d, rel=1e-4)
    g_t = np.asarray(jax.grad(lambda f: loss(f, "pallas"))(feats))
    g_d = np.asarray(jax.grad(lambda f: loss(f, "dense"))(feats))
    scale = np.abs(g_d).max() + 1e-8
    np.testing.assert_allclose(g_t / scale, g_d / scale, atol=2e-3)


def test_overflow_reported():
    s = make_scene(n=300)
    proj = project(s)
    out = rasterize(
        proj, jnp.zeros(3), W, H, TILE, pair_budget=64, backend="pallas"
    )
    assert int(out["overflow"]) > 0


def test_tile_boundary_gaussians():
    """Hand-placed Gaussians exactly on tile seams (and off-screen) must
    match the oracle — exercises rect clipping and head-alignment paths."""
    from semantic_gaussians_tpu.ops.projection import ProjectedGaussians

    rng = np.random.default_rng(7)
    # pixel positions on/straddling every seam of the 2x8 (8,128)-tile grid,
    # plus off-screen and corner cases
    seam_pts = [
        (127.5, 7.5), (128.0, 8.0), (128.5, 8.5), (0.0, 0.0),
        (255.5, 63.5), (127.9, 31.9), (128.1, 32.1), (-5.0, 10.0),
        (260.0, 10.0), (100.0, -3.0), (100.0, 66.0), (128.0, 0.0),
        (0.0, 8.0), (255.0, 56.0), (64.0, 16.0), (192.0, 48.0),
    ]
    n = len(seam_pts)
    means2d = jnp.asarray(np.array(seam_pts, np.float32))
    sigma = rng.uniform(2.0, 6.0, size=n).astype(np.float32)
    conics = jnp.asarray(
        np.stack([1 / sigma**2, np.zeros(n, np.float32), 1 / sigma**2], -1)
    )
    radii_np = np.ceil(3 * sigma).astype(np.int32)
    proj = ProjectedGaussians(
        means2d=means2d,
        depths=jnp.asarray(rng.uniform(1, 5, size=n).astype(np.float32)),
        conics=conics,
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, size=n).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        radii=jnp.asarray(radii_np),
        radii_xy=jnp.asarray(np.stack([radii_np, radii_np], -1)),
    )
    out_t = rasterize(proj, jnp.zeros(3), W, H, TILE, backend="pallas")
    out_d = rasterize(proj, jnp.zeros(3), W, H, TILE, backend="dense")
    np.testing.assert_allclose(
        np.asarray(out_t["render"]), np.asarray(out_d["render"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_t["depth"]), np.asarray(out_d["depth"]),
        rtol=1e-4, atol=1e-4,
    )
