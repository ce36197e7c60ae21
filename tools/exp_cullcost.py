"""Isolate the tight-cull cost inside bin_gaussians at scale.

5M @ 1080p regressed +154 ms with the cull on (864 vs 710 ms) while the
100k headline IMPROVED 0.5 ms — this times binning alone (with/without
cull columns) plus the depth sort alone at each scale to attribute the
delta before deciding how to fix it.

Usage: python tools/exp_cullcost.py [--n 5000000 --width 1920 --height 1080]
"""
import argparse
import sys
import time

import numpy as np

from common import setup

sys.path.insert(0, ".")


def timeit(fn, *args, inner=5, iters=3):
    import jax

    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(jfn(*args))
    return (time.perf_counter() - t0) / (iters * inner) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    jax = setup(args.cpu)
    import jax.numpy as jnp

    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.ops.binning import bin_gaussians
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.rasterize import DEFAULT_TILE
    from semantic_gaussians_tpu.pipelines.train import tuned_pair_budget
    from semantic_gaussians_tpu.utils.camera import make_camera

    w, h, n = args.width, args.height, args.n
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    density_shift = -np.log(max(n / 1e5, 1.0)) / 3.0
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=jnp.zeros((n, 1, 3)),
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
    proj = jax.jit(
        lambda p: project_gaussians(
            p.means, p.scales, p.quats, p.opacity[:, 0],
            cam.world_view, cam.full_proj, cam.camera_center,
            w, h, cam.tan_half_fov_x, cam.tan_half_fov_y,
            sh_coeffs=p.sh_coeffs, sh_degree=3,
            alive=jnp.ones((n,), bool),
        )
    )(params)
    th, tw = DEFAULT_TILE
    grid = (-(-h // th), -(-w // tw))
    b0 = jax.jit(
        lambda m, d, r: bin_gaussians(m, d, r, DEFAULT_TILE, grid, 1 << 23)
    )(proj.means2d, proj.depths, proj.radii_xy)
    budget = tuned_pair_budget(int(b0.num_pairs))
    print(f"pairs={int(b0.num_pairs)} budget={budget}")

    inner = 5

    def chain(f):
        def run(m2d, *rest):
            return jax.lax.fori_loop(
                0, inner, lambda i, m: f(m, *rest), m2d
            )
        return run

    def bin_nocull(m2d, depths, radii):
        b = bin_gaussians(m2d, depths, radii, DEFAULT_TILE, grid, budget)
        return m2d - 1e-30 * b.num_pairs.astype(jnp.float32)

    def bin_cull(m2d, depths, radii, ce):
        b = bin_gaussians(
            m2d, depths, radii, DEFAULT_TILE, grid, budget, cull_ellipse=ce
        )
        return m2d - 1e-30 * b.num_pairs.astype(jnp.float32)

    t_nc = timeit(
        chain(bin_nocull), proj.means2d, proj.depths, proj.radii_xy,
        inner=inner,
    )
    t_c = timeit(
        chain(bin_cull), proj.means2d, proj.depths, proj.radii_xy,
        proj.cull_ellipse, inner=inner,
    )
    print(f"binning no-cull: {t_nc:8.2f} ms")
    print(f"binning cull:    {t_c:8.2f} ms   (delta {t_c - t_nc:+.2f})")

    # depth sort alone, 4 vs 9 payloads
    def sort_np(m2d, depths, npay):
        cols = (depths, jnp.arange(n, dtype=jnp.int32)) + tuple(
            m2d[:, 0] + float(i) for i in range(npay - 2)
        )
        out = jax.lax.sort(cols, num_keys=1, is_stable=True)
        return m2d - 1e-30 * out[1][0].astype(jnp.float32)

    for npay in (4, 9):
        t = timeit(
            chain(lambda m, d, k=npay: sort_np(m, d, k)),
            proj.means2d, proj.depths, inner=inner,
        )
        print(f"depth sort {npay} payloads: {t:8.2f} ms")


if __name__ == "__main__":
    main()
