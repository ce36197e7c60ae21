"""Measure how many binned pairs fail an EXACT tile-ellipse support test.

The binning rect (per-axis opacity-aware half-extents, projection.py
radii_xy) admits tiles in the rect's corners that the splat's elliptical
alpha support never touches: every pixel of such a tile fails the kernel's
alpha >= 1/255 cutoff, so the pair costs chunk compute and contributes
nothing. The exact test: min over the tile's pixel rectangle of the
Mahalanobis form q(d) = A dx^2 + 2 B dx dy + C dy^2 (conic = (A,B,C),
renderCUDA power semantics, ref forward.cu:326-363) compared against
r^2 = 2 ln(255 * opacity). Continuous-rectangle min <= discrete pixel min,
so culling on it is output-exact.

This tool quantifies the opportunity (fraction of live pairs culled, and
the resulting per-tile chunk-count reduction, which is what the composite
kernels actually bill) at bench.py's scene configs before committing to a
pipeline change.

Usage: python tools/exp_tightcull.py [--cpu] [--n 100000] [--width 640]
       [--height 480]
"""
import argparse
import sys

import numpy as np

from common import setup

sys.path.insert(0, ".")


def tile_min_q(lo_x, hi_x, lo_y, hi_y, A, B, C):
    """Exact min of q over the box [lo_x,hi_x]x[lo_y,hi_y] (PD form).

    If the origin is inside the box the min is 0; otherwise it lies on one
    of the four edges, where the 1D restriction is a scalar quadratic with
    a closed-form clamped minimizer.
    """
    inside = (lo_x <= 0) & (hi_x >= 0) & (lo_y <= 0) & (hi_y >= 0)

    def q(dx, dy):
        return A * dx * dx + 2.0 * B * dx * dy + C * dy * dy

    def edge_x(e):  # dx fixed = e, dy free in [lo_y, hi_y]
        dy = np.clip(-B * e / np.maximum(C, 1e-12), lo_y, hi_y)
        return q(e, dy)

    def edge_y(e):
        dx = np.clip(-B * e / np.maximum(A, 1e-12), lo_x, hi_x)
        return q(dx, e)

    m = np.minimum(
        np.minimum(edge_x(lo_x), edge_x(hi_x)),
        np.minimum(edge_y(lo_y), edge_y(hi_y)),
    )
    return np.where(inside, 0.0, m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()
    setup(args.cpu)

    import jax.numpy as jnp

    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.ops.binning import (
        bin_gaussians,
        default_pair_budget,
    )
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.rasterize import DEFAULT_TILE
    from semantic_gaussians_tpu.utils.camera import make_camera

    # Same synthetic scene construction as bench.py (density-scaled sizes).
    w, h, n = args.width, args.height, args.n
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    density_shift = -np.log(max(n / 1e5, 1.0)) / 3.0
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=((jnp.asarray(cols) - 0.5) / 0.28209479177387814)[:, None, :],
        sh_rest=jnp.zeros((n, 15, 3)),
        log_scales=jnp.asarray(
            (rng.uniform(-4.5, -3.0, size=(n, 3)) + density_shift).astype(
                np.float32
            )
        ),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.asarray(
            rng.uniform(-1.0, 1.5, size=(n, 1)).astype(np.float32)
        ),
    )
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, w, h)

    proj = project_gaussians(
        params.means, params.scales, params.quats, params.opacity[:, 0],
        cam.world_view, cam.full_proj, cam.camera_center,
        w, h, cam.tan_half_fov_x, cam.tan_half_fov_y,
        sh_coeffs=params.sh_coeffs, sh_degree=3,
        alive=jnp.ones((n,), bool),
    )
    th, tw = DEFAULT_TILE
    grid_h, grid_w = -(-h // th), -(-w // tw)
    budget = min(default_pair_budget(n), (1 << 24) - 8192)
    binning = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, (th, tw),
        (grid_h, grid_w), budget,
    )

    num_tiles = grid_h * grid_w
    pair_g = np.asarray(binning.pair_gaussian)
    pair_tile = np.asarray(binning.pair_tile)
    valid = pair_tile < num_tiles
    g = pair_g[valid]
    t = pair_tile[valid]
    tx, ty = t % grid_w, t // grid_w

    mean2d = np.asarray(proj.means2d)[g]
    conic = np.asarray(proj.conics)[g]
    op = np.asarray(proj.opacities)[g]

    x0 = (tx * tw).astype(np.float32)
    y0 = (ty * th).astype(np.float32)
    lo_x = x0 - mean2d[:, 0]
    hi_x = x0 + (tw - 1) - mean2d[:, 0]
    lo_y = y0 - mean2d[:, 1]
    hi_y = y0 + (th - 1) - mean2d[:, 1]
    qmin = tile_min_q(lo_x, hi_x, lo_y, hi_y, conic[:, 0], conic[:, 1],
                      conic[:, 2])
    r2 = 2.0 * np.log(np.maximum(255.0 * op, 1e-12))
    cull = qmin > r2

    # Cheaper CIRCLE variant (fits the expand kernel's 3 spare table rows):
    # q >= dmin^2 * lambda_min(conic), so dmin^2 > r2 / lambda_min(conic)
    # proves every tile pixel fails the alpha cutoff. Conservative for
    # anisotropic splats (uses the loosest conic direction).
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    mid = 0.5 * (A + C)
    lam_min = mid - np.sqrt(np.maximum(mid * mid - (A * C - B * B), 0.0))
    rc2 = r2 / np.maximum(lam_min, 1e-12)
    dminx = np.maximum(np.maximum(lo_x, -hi_x), 0.0)
    dminy = np.maximum(np.maximum(lo_y, -hi_y), 0.0)
    cull_circle = dminx * dminx + dminy * dminy > rc2

    live = int(valid.sum())
    nc = int(cull.sum())
    ncc = int(cull_circle.sum())
    print(f"live pairs:          {live}")
    print(f"exact-cullable:      {nc} ({100.0 * nc / live:.1f}%)")
    print(f"circle-cullable:     {ncc} ({100.0 * ncc / live:.1f}%)")
    assert not np.any(cull_circle & ~cull), "circle test must be conservative"

    # What the composite kernels actually bill: ceil(count/CHUNK) per tile.
    chunk = 128
    cnt_before = np.bincount(t, minlength=num_tiles)
    cnt_after = np.bincount(t[~cull], minlength=num_tiles)
    ch_b = int(np.sum(-(-cnt_before // chunk)))
    ch_a = int(np.sum(-(-cnt_after // chunk)))
    print(f"chunks before/after: {ch_b} / {ch_a} "
          f"({100.0 * (ch_b - ch_a) / max(ch_b, 1):.1f}% fewer)")


if __name__ == "__main__":
    main()
