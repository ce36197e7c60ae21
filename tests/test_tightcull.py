"""Exact tile-ellipse pair culling (round 5): correctness + output parity.

The binning rect admits tiles in its corners that lie wholly outside the
splat's alpha >= 1/255 support ellipse; ops.expand retires those pairs to
the sentinel tile before the tile sort (~10% of live pairs at the bench
configs, tools/exp_tightcull.py). These tests pin:
  * the culled SET equals a numpy brute-force min-over-tile Mahalanobis
    test (kernel path and XLA fallback, bitwise-identical streams);
  * culling is OUTPUT-EXACT: render/depth/final_T and all gradients match
    the uncalled pipeline (the culled pairs fail the alpha cutoff at every
    pixel of their tile, so they contributed exactly nothing);
  * the packed-rect f32 roundtrip is exact at the 255/255/255 extreme.
Role parity: the pairs this removes are walked-and-skipped by the
reference's renderCUDA (forward.cu:326-363) — the reference bins by
bounding square (auxiliary.h:46-56) and pays the same dead work.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_gaussians_tpu.ops.binning import bin_gaussians
from semantic_gaussians_tpu.ops.expand import TIGHTCULL_MARGIN
from semantic_gaussians_tpu.ops.projection import project_gaussians
from semantic_gaussians_tpu.ops.rasterize import rasterize
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.utils.sh import rgb_to_sh

W, H = 256, 64
TILE = (16, 32)


def make_scene(n=400, seed=3):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.2, 0.45, 0.8], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(-3.2, -1.2, size=(n, 3))).astype(np.float32)
    )  # wide range: multi-tile rects with corner tiles to cull
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.05, 0.95, size=(n,)).astype(np.float32))
    k = 16
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0] = np.asarray(rgb_to_sh(rng.uniform(size=(n, 3)).astype(np.float32)))
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 0.5, W, H)
    proj = project_gaussians(
        jnp.asarray(means), scales, quats, opac,
        cam.world_view, cam.full_proj, cam.camera_center,
        W, H, cam.tan_half_fov_x, cam.tan_half_fov_y,
        sh_coeffs=jnp.asarray(sh), sh_degree=3,
    )
    return dict(
        means=jnp.asarray(means), scales=scales, quats=quats, opac=opac,
        sh=jnp.asarray(sh), cam=cam, proj=proj,
    )


def _np_qmin(lox, hix, loy, hiy, e0, e1, e2):
    inside = (lox <= 0) & (hix >= 0) & (loy <= 0) & (hiy >= 0)

    def q(dx, dy):
        return e0 * dx * dx + 2 * e1 * dx * dy + e2 * dy * dy

    e0s, e2s = np.maximum(e0, 1e-20), np.maximum(e2, 1e-20)
    m = np.minimum(
        np.minimum(
            q(lox, np.clip(-e1 * lox / e2s, loy, hiy)),
            q(hix, np.clip(-e1 * hix / e2s, loy, hiy)),
        ),
        np.minimum(
            q(np.clip(-e1 * loy / e0s, lox, hix), loy),
            q(np.clip(-e1 * hiy / e0s, lox, hix), hiy),
        ),
    )
    return np.where(inside, 0.0, m)


def test_culled_set_matches_bruteforce():
    s = make_scene()
    proj = s["proj"]
    th, tw = TILE
    grid = (-(-H // th), -(-W // tw))
    nty, ntx = grid
    budget = 8192
    b = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, TILE, grid, budget,
        cull_ellipse=proj.cull_ellipse,
    )
    b0 = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, TILE, grid, budget,
    )
    num_tiles = nty * ntx
    total = int(b0.num_pairs)
    assert int(b.num_pairs) == total  # pre-cull accounting unchanged

    # brute-force expected cull per (pre-cull) pair, in b0's SORTED order
    g = np.asarray(b0.pair_gaussian)[:total]
    t = np.asarray(b0.pair_tile)[:total]
    m2d = np.asarray(proj.means2d)[g]
    ce = np.asarray(proj.cull_ellipse)[g]
    tx, ty = t % ntx, t // ntx
    lox = (tx * tw).astype(np.float32) - m2d[:, 0]
    loy = (ty * th).astype(np.float32) - m2d[:, 1]
    qmin = _np_qmin(lox, lox + (tw - 1), loy, loy + (th - 1),
                    ce[:, 0], ce[:, 1], ce[:, 2])
    keep = ~(qmin > TIGHTCULL_MARGIN)
    assert 0 < int((~keep).sum()) < total, "scene must exercise the cull"

    # the culled pipeline's surviving (tile, gaussian) multiset must equal
    # the brute-force-kept subset of the uncalled pipeline's pairs
    n_live = int(np.asarray(b.gen_live).sum())
    assert n_live == int(keep.sum())
    want = sorted(zip(t[keep].tolist(), g[keep].tolist()))
    got = sorted(
        zip(
            np.asarray(b.pair_tile)[:n_live].tolist(),
            np.asarray(b.pair_gaussian)[:n_live].tolist(),
        )
    )
    assert want == got


def test_cull_output_and_grads_exact(monkeypatch):
    s = make_scene(n=300, seed=5)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    wimg = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))

    def run(with_cull):
        if not with_cull:
            monkeypatch.setenv("SGTPU_NO_TIGHTCULL", "1")

        def loss(means, scales, quats, opac, sh):
            cam = s["cam"]
            proj = project_gaussians(
                means, scales, quats, opac,
                cam.world_view, cam.full_proj, cam.camera_center,
                W, H, cam.tan_half_fov_x, cam.tan_half_fov_y,
                sh_coeffs=sh, sh_degree=3,
            )
            out = rasterize(proj, bg, W, H, TILE, backend="pallas")
            return jnp.sum(out["render"] * wimg), out

        args = (s["means"], s["scales"], s["quats"], s["opac"], s["sh"])
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(*args)
        if not with_cull:
            monkeypatch.delenv("SGTPU_NO_TIGHTCULL")
        return l, out, grads

    l1, out1, g1 = run(True)
    l0, out0, g0 = run(False)
    # chunk regrouping within tiles reorders the f32 recurrence slightly;
    # the culled pairs themselves contribute exactly zero either way
    np.testing.assert_allclose(
        np.asarray(out1["render"]), np.asarray(out0["render"]),
        rtol=2e-6, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out1["depth"]), np.asarray(out0["depth"]),
        rtol=1e-6, atol=1e-5,
    )
    for a, b in zip(g1, g0):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_dense_oracle_matches_with_cull():
    """The oracle reproduces the cull decision (n_contrib bit parity)."""
    s = make_scene(n=250, seed=9)
    proj = s["proj"]
    bg = jnp.zeros(3)
    tiled = rasterize(proj, bg, W, H, TILE, backend="pallas")
    dense = rasterize(proj, bg, W, H, TILE, backend="dense")
    np.testing.assert_allclose(
        np.asarray(tiled["render"]), np.asarray(dense["render"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(tiled["n_contrib"]), np.asarray(dense["n_contrib"])
    )


def test_rect_pack_roundtrip_extremes():
    for x0, y0, w in [(255, 255, 255), (0, 0, 1), (255, 0, 255), (7, 255, 1)]:
        pr = np.float32(np.int32((x0 << 16) | (y0 << 8) | w))
        x0f = np.floor(pr / np.float32(65536.0))
        rem = pr - x0f * np.float32(65536.0)
        y0f = np.floor(rem / np.float32(256.0))
        wf = rem - y0f * np.float32(256.0)
        assert (int(x0f), int(y0f), int(wf)) == (x0, y0, w)
