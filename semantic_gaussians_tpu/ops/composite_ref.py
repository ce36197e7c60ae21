"""Dense reference compositor — the correctness oracle.

A pure-JAX O(N * pixels) re-statement of the tile renderer's per-pixel
front-to-back alpha compositing loop (renderCUDA,
/root/reference/submodules/rgbd-rasterization/cuda_rasterizer/forward.cu:262-393),
differentiable end-to-end by autodiff. Slow by design; used for tests and the
CPU-runnable small config (BASELINE config #1). Exactly reproduces:

  alpha      = min(0.99, opacity * exp(power)),  power = -0.5(A dx^2 + C dy^2) - B dx dy
  skip       if power > 0 or alpha < 1/255
  terminate  (per pixel) when T*(1-alpha) < 1e-4, *without* compositing that one
  median depth = depth where T crosses 0.5 (init 15.0)
  out        = C + T * bg

With `tile_shape` given, contributions are additionally restricted to each
Gaussian's tile-aligned bounding rect (getRect, auxiliary.h:46-56) so the
oracle is bit-comparable with the tiled kernels. When the projection
carries `cull_ellipse`, the tiled path additionally retires pairs whose
tile fails the exact ellipse-support test (ops.expand.tile_min_qn); the
oracle reproduces that decision per (gaussian, pixel-tile) with the SAME
shared formula so per-tile walk counts (n_contrib) stay bit-comparable.
The cull never changes rendered output: every pixel of a culled tile
fails the alpha cutoff by construction.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians

ALPHA_CUTOFF = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
MEDIAN_DEPTH_INIT = 15.0


def rasterize_dense(
    proj: ProjectedGaussians,
    img_width: int,
    img_height: int,
    bg: jnp.ndarray,  # [C]
    tile_shape: Optional[Tuple[int, int]] = None,  # (tile_h, tile_w)
) -> dict:
    """Composite every Gaussian over every pixel, in global depth order.

    Returns dict(render=[H,W,C], depth=[H,W], final_T=[H,W], n_contrib=[H,W]).
    """
    n = proj.means2d.shape[0]
    num_ch = proj.colors.shape[-1]

    # Global depth order; culled entries (zero extent, opacity 0) last.
    has_rect = (proj.radii_xy[:, 0] > 0) & (proj.radii_xy[:, 1] > 0)
    sort_depth = jnp.where(has_rect, proj.depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    opac = proj.opacities[order]
    colors = proj.colors[order]
    depths = proj.depths[order]
    radii_xy = proj.radii_xy[order]
    # Tile-ellipse cull rows (zeros = no cull; matches the binning paths).
    cull_e = (
        jnp.zeros((n, 3), jnp.float32)
        if proj.cull_ellipse is None
        else proj.cull_ellipse[order]
    )

    ys = jnp.arange(img_height, dtype=jnp.float32)
    xs = jnp.arange(img_width, dtype=jnp.float32)
    px_y, px_x = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

    if tile_shape is not None:
        th, tw = tile_shape
        ntx = -(-img_width // tw)
        nty = -(-img_height // th)
        tile_ix = (px_x / tw).astype(jnp.int32)
        tile_iy = (px_y / th).astype(jnp.int32)

    def step(state, row):
        T, C, D, done, n_contrib, walk = state
        mean2d, conic, o, color, depth, rect_xy, ce = row
        dx = mean2d[0] - px_x
        dy = mean2d[1] - px_y
        power = (
            -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
        )
        # exp clamped at 0: power > 0 is masked out below anyway (CUDA skips
        # it pre-exp), and this keeps huge positive powers from overflowing
        # into inf/NaN that would poison reverse-mode through jnp.where.
        alpha = jnp.minimum(MAX_ALPHA, o * jnp.exp(jnp.minimum(power, 0.0)))
        candidate = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
        if tile_shape is not None:
            # getRect clamp (auxiliary.h:46-56) with the per-axis extents the
            # tiled binning uses: pixel visible only if its tile is inside
            # the Gaussian's rect.
            rx = rect_xy[0].astype(jnp.float32)
            ry = rect_xy[1].astype(jnp.float32)
            x0 = jnp.clip(jnp.floor((mean2d[0] - rx) / tw), 0, ntx).astype(jnp.int32)
            x1 = jnp.clip(
                jnp.floor((mean2d[0] + rx + tw - 1) / tw), 0, ntx
            ).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor((mean2d[1] - ry) / th), 0, nty).astype(jnp.int32)
            y1 = jnp.clip(
                jnp.floor((mean2d[1] + ry + th - 1) / th), 0, nty
            ).astype(jnp.int32)
            in_rect = (
                (tile_ix >= x0) & (tile_ix < x1) & (tile_iy >= y0) & (tile_iy < y1)
            )
            # Exact tile-ellipse cull — the SAME shared formula the binning
            # paths retire pairs with, evaluated at this pixel's tile.
            from .expand import TIGHTCULL_MARGIN, tile_min_qn

            lox = (tile_ix * tw).astype(jnp.float32) - mean2d[0]
            hix = lox + float(tw - 1)
            loy = (tile_iy * th).astype(jnp.float32) - mean2d[1]
            hiy = loy + float(th - 1)
            qn = tile_min_qn(lox, hix, loy, hiy, ce[0], ce[1], ce[2])
            in_rect = in_rect & jnp.logical_not(qn > TIGHTCULL_MARGIN)
            candidate = candidate & in_rect
        test_T = T * (1.0 - alpha)
        terminate = candidate & (test_T < T_EPS)
        contribute = candidate & ~terminate & ~done
        w = jnp.where(contribute, alpha * T, 0.0)
        C = C + w[..., None] * color[None, None, :]
        median_hit = contribute & (T > 0.5) & (test_T < 0.5)
        D = jnp.where(median_hit, depth, D)
        T = jnp.where(contribute, test_T, T)
        done = done | terminate
        # CUDA semantics (forward.cu:330, :368-371): `contributor` counts
        # every pair WALKED in the pixel's list (in_rect when tiled), and
        # n_contrib records that 1-based index at the last contribution —
        # NOT the number of contributors. Keeps the oracle bit-comparable
        # with the Pallas kernel's last_contributor output.
        if tile_shape is not None:
            # zero-extent (culled) entries emit no pairs in the kernel, so
            # they never advance the per-tile walk there either
            in_list = in_rect & (rect_xy[0] > 0) & (rect_xy[1] > 0)
            walk = walk + in_list.astype(jnp.int32)
        else:
            walk = walk + jnp.ones((), jnp.int32)
        n_contrib = jnp.where(contribute, walk, n_contrib)
        return (T, C, D, done, n_contrib, walk), None

    init = (
        jnp.ones((img_height, img_width), jnp.float32),
        jnp.zeros((img_height, img_width, num_ch), jnp.float32),
        jnp.full((img_height, img_width), MEDIAN_DEPTH_INIT, jnp.float32),
        jnp.zeros((img_height, img_width), bool),
        jnp.zeros((img_height, img_width), jnp.int32),
        (
            jnp.zeros((img_height, img_width), jnp.int32)
            if tile_shape is not None
            else jnp.zeros((), jnp.int32)
        ),
    )
    (T, C, D, _, n_contrib, _), _ = jax.lax.scan(
        step, init, (means2d, conics, opac, colors, depths, radii_xy, cull_e)
    )
    render = C + T[..., None] * bg[None, None, :]
    return dict(render=render, depth=D, final_T=T, n_contrib=n_contrib)
