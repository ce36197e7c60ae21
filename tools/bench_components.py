"""Component-level timing of the bench step on the real TPU.

Times each stage of the differentiable render path in isolation with the
chained fori_loop pattern (one dispatch, dependent iterations — excludes the
~90ms axon tunnel latency). Large inputs are passed as arguments, never
closed over (remote-compile body size limit).
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, *args, inner=10, iters=3):
    import jax

    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(jfn(*args))
    dt = (time.perf_counter() - t0) / (iters * inner)
    return dt * 1e3


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera
    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.binning import bin_gaussians
    from semantic_gaussians_tpu.ops.rasterize import (
        DEFAULT_TILE, _pack_pair_cols, _untile,
    )
    from semantic_gaussians_tpu.ops.composite_pallas import (
        CompositeConfig, composite_pairs, pad_pair_cols,
    )

    w, h = 640, 480
    n = 100_000
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.6, 1.1, 1.0], np.float32
    ) + np.array([0, 0, 4], np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    k = 16
    sh_dc = ((jnp.asarray(cols) - 0.5) / 0.28209479177387814)[:, None, :]
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=sh_dc,
        sh_rest=jnp.zeros((n, k - 1, 3)),
        log_scales=jnp.asarray(
            rng.uniform(-4.5, -3.0, size=(n, 3)).astype(np.float32)
        ),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.asarray(
            rng.uniform(-1.0, 1.5, size=(n, 1)).astype(np.float32)
        ),
    )
    alive = jnp.ones((n,), bool)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, w, h)
    target = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    budget = 393_216
    inner = 10

    def chain(f):
        """fori_loop-chained version of f: params -> scalar-ish pytree."""

        def run(p):
            def body(i, p):
                o = f(p)
                return jax.tree.map(
                    lambda x, y: x - 1e-30 * jnp.mean(y) * jnp.ones_like(x)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                    jax.tree.map(lambda z: z.astype(jnp.float32), o),
                )

            return jax.lax.fori_loop(0, inner, body, p)

        return run

    results = {}

    # --- full step (reference point) -------------------------------------
    def loss(params):
        out = render(cam, params, alive=alive, pair_budget=budget)
        return jnp.mean((out["render"] - target) ** 2)

    grad = jax.grad(loss)

    def full_step(p):
        g = grad(p)
        return jax.tree.map(lambda x, y: x - 1e-30 * y, p, g)

    def full_chain(p):
        return jax.lax.fori_loop(0, inner, lambda i, q: full_step(q), p)

    results["full fwd+bwd"] = timeit(full_chain, params)

    # --- forward only -----------------------------------------------------
    def fwd_only(p):
        out = render(cam, p, alive=alive, pair_budget=budget)
        s = jnp.mean(out["render"])
        return jax.tree.map(lambda x: x - 1e-30 * s, p)

    def fwd_chain(p):
        return jax.lax.fori_loop(0, inner, lambda i, q: fwd_only(q), p)

    results["full fwd only"] = timeit(fwd_chain, params)

    # --- projection only --------------------------------------------------
    def proj_fn(p):
        proj = project_gaussians(
            p.means, p.scales, p.quats, p.opacity[:, 0],
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
            sh_coeffs=p.sh_coeffs, sh_degree=3, alive=alive,
        )
        s = jnp.mean(proj.means2d) + jnp.mean(proj.colors)
        return jax.tree.map(lambda x: x - 1e-30 * s, p)

    def proj_chain(p):
        return jax.lax.fori_loop(0, inner, lambda i, q: proj_fn(q), p)

    results["projection fwd"] = timeit(proj_chain, params)

    # precompute proj/binning for the isolated stages
    proj0 = jax.jit(
        lambda p: project_gaussians(
            p.means, p.scales, p.quats, p.opacity[:, 0],
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
            sh_coeffs=p.sh_coeffs, sh_degree=3, alive=alive,
        )
    )(params)
    grid = (-(-h // DEFAULT_TILE[0]), -(-w // DEFAULT_TILE[1]))
    bin0 = jax.jit(
        lambda pr: bin_gaussians(
            pr.means2d, pr.depths, pr.radii_xy, DEFAULT_TILE, grid, budget
        )
    )(proj0)
    print("num_pairs:", int(bin0.num_pairs), "overflow:", int(bin0.overflow))

    # --- binning only (depends on proj outputs; chain via means2d) --------
    def bin_fn(m2d, depths, radii_xy):
        b = bin_gaussians(m2d, depths, radii_xy, DEFAULT_TILE, grid, budget)
        return m2d - 1e-30 * b.num_pairs.astype(jnp.float32)

    def bin_chain(m2d, depths, radii_xy):
        return jax.lax.fori_loop(
            0, inner, lambda i, m: bin_fn(m, depths, radii_xy), m2d
        )

    results["binning"] = timeit(
        bin_chain, proj0.means2d, proj0.depths, proj0.radii_xy
    )

    # --- pack gather fwd --------------------------------------------------
    cfg = CompositeConfig(
        tile_h=DEFAULT_TILE[0], tile_w=DEFAULT_TILE[1],
        grid_h=grid[0], grid_w=grid[1], num_channels=3, interpret=False,
    )
    def pack_fwd(pr, bn):
        pd = _pack_pair_cols(pr, bn, cfg)
        return jax.tree.map(
            lambda x: x - 1e-30 * jnp.mean(pd)
            if x.dtype == jnp.float32
            else x,
            pr,
        )

    def pack_chain(pr, bn):
        return jax.lax.fori_loop(0, inner, lambda i, q: pack_fwd(q, bn), pr)

    results["pack gather fwd"] = timeit(pack_chain, proj0, bin0)

    # --- pack gather fwd + VJP (isolates the scatter-add) ----------------
    import dataclasses as _dc

    def pack_loss(m2d, colors, pr, bn):
        pr = _dc.replace(pr, means2d=m2d, colors=colors)
        pd = _pack_pair_cols(pr, bn, cfg)
        return jnp.sum(pd * 1e-6)

    pack_grad = jax.grad(pack_loss, argnums=(0, 1))

    def packg_chain(m2d, colors, pr, bn):
        def body(i, q):
            m, c = q
            gm, gc = pack_grad(m, c, pr, bn)
            return (m - 1e-30 * gm, c - 1e-30 * gc)

        return jax.lax.fori_loop(0, inner, body, (m2d, colors))

    results["pack gather fwd+bwd"] = timeit(
        packg_chain, proj0.means2d, proj0.colors, proj0, bin0
    )

    # --- composite kernels ------------------------------------------------
    pair0 = jax.jit(lambda pr, bn: _pack_pair_cols(pr, bn, cfg))(
        proj0, bin0
    )
    bg = jnp.zeros(3)

    def comp_fwd(pd, ts, tc):
        color, depth, ft, nc = composite_pairs(cfg, pd, bg, ts, tc)
        return pd - 1e-30 * jnp.mean(color)

    def compf_chain(pd, ts, tc):
        return jax.lax.fori_loop(
            0, inner, lambda i, q: comp_fwd(q, ts, tc), pd
        )

    results["composite fwd"] = timeit(
        compf_chain, pair0, bin0.tile_start, bin0.tile_count
    )

    def comp_loss(pd, ts, tc):
        color, depth, ft, nc = composite_pairs(cfg, pd, bg, ts, tc)
        return jnp.mean(color)

    comp_grad = jax.grad(comp_loss)

    def compg_chain(pd, ts, tc):
        return jax.lax.fori_loop(
            0, inner, lambda i, q: q - 1e-8 * comp_grad(q, ts, tc), pd
        )

    results["composite fwd+bwd"] = timeit(
        compg_chain, pair0, bin0.tile_start, bin0.tile_count
    )

    print()
    for k_, v in results.items():
        print(f"{k_:>24}: {v:7.2f} ms")


if __name__ == "__main__":
    main()
