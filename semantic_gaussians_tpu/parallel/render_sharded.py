"""Tile-band sharded rendering: one view's rays across the device mesh.

The north-star distributed design (BASELINE.md): the TILE GRID (pixels/rays)
is sharded over chips, Gaussians stay replicated, and backward parameter
gradients are psum'd by shard_map's transpose — the XLA-collective
re-design of the reference's (absent) multi-GPU story.

Mechanism: each device renders a horizontal band of `band_rows` tile rows.
Shifting means2d down by the band's pixel offset turns the band into an
independent smaller render (the Gaussian-pixel falloff depends only on
pixel deltas), so the single-chip projection/binning/composite stack is
reused unchanged with a (band_rows, grid_w) grid; per-band binning also
shrinks the sort to the band's pairs. Bands are written to disjoint image
slices (out_specs sharded over the row axis).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.gaussians import GaussianParams
from ..ops.binning import band_pair_budget, bin_gaussians
from ..ops.composite_pallas import CompositeConfig, composite_pairs
from ..ops.projection import project_gaussians
from ..ops.rasterize import DEFAULT_TILE, _pack_pair_cols, _untile
from ..utils.camera import Camera


def band_render_core(
    camera: Camera,
    params: GaussianParams,
    alive_in,
    override,
    bg_in,
    m2d_off,
    band,
    band_rows: int,
    tile_shape: Tuple[int, int],
    grid_w: int,
    budget: int,
    cfg: CompositeConfig,
    sh_degree: int,
):
    """Render tile-row band `band` of `camera` (shared by the band-sharded
    renderer and the hybrid view x band train step).

    Shifting means2d down by the band's pixel offset turns the band into an
    independent smaller render (the Gaussian-pixel falloff depends only on
    pixel deltas), so the single-chip projection/binning/composite stack is
    reused unchanged with a (band_rows, grid_w) grid. Returns tile-major
    band buffers + overflow[1] + radii[1, N].
    """
    import dataclasses as _dc

    th, _tw = tile_shape
    row0 = band * band_rows
    proj = project_gaussians(
        params.means,
        params.scales,
        params.quats,
        params.opacity[:, 0],
        camera.world_view,
        camera.full_proj,
        camera.camera_center,
        camera.width,
        camera.height,
        camera.tan_half_fov_x,
        camera.tan_half_fov_y,
        sh_coeffs=None if override is not None else params.sh_coeffs,
        sh_degree=sh_degree,
        override_color=override,
        alive=None if alive_in is None else alive_in,
        mean2d_offset=m2d_off,
    )
    means2d_local = proj.means2d - jnp.array([[0.0, row0 * th]])
    proj = _dc.replace(proj, means2d=means2d_local)
    from ..ops.rasterize import _tightcull_gate

    binning = bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, tile_shape,
        (band_rows, grid_w), budget,
        cull_ellipse=_tightcull_gate(
            proj.means2d.shape[0], proj.cull_ellipse
        ),
    )
    pair_data = _pack_pair_cols(proj, binning, cfg)
    color, depth, final_t, n_contrib = composite_pairs(
        cfg, pair_data, bg_in, binning.tile_start, binning.tile_count
    )
    return (
        color, depth, final_t, n_contrib,
        binning.overflow[None], proj.radii[None],
    )


def render_sharded(
    camera: Camera,
    params: GaussianParams,
    alive: Optional[jnp.ndarray],
    mesh: Mesh,
    bg: Optional[jnp.ndarray] = None,
    *,
    active_sh_degree: Optional[int] = None,
    override_color: Optional[jnp.ndarray] = None,
    tile_shape: Tuple[int, int] = DEFAULT_TILE,
    pair_budget: Optional[int] = None,
    axis: str = "data",
    mean2d_offset: Optional[jnp.ndarray] = None,  # [N,2] zeros (densify stats)
) -> dict:
    """Render one camera with its tile rows sharded across `mesh`.

    Differentiable: parameter gradients are psum'd across bands by the
    shard_map transpose. Returns the same dict as ops.rasterize.rasterize.
    """
    th, tw = tile_shape
    ndev = mesh.shape[axis]
    grid_w = -(-camera.width // tw)
    grid_h = -(-camera.height // th)
    band_rows = -(-grid_h // ndev)  # tile rows per device
    n = params.capacity
    # Per-band budget with 2x headroom (see binning.band_pair_budget);
    # overflow is still counted and surfaced; pass pair_budget to override.
    budget = pair_budget or band_pair_budget(n, ndev)
    num_ch = 3 if override_color is None else override_color.shape[-1]
    if bg is None:
        bg = jnp.zeros(num_ch, jnp.float32)
    sh_degree = (
        params.max_sh_degree if active_sh_degree is None else active_sh_degree
    )

    cfg = CompositeConfig(
        tile_h=th,
        tile_w=tw,
        grid_h=band_rows,
        grid_w=grid_w,
        num_channels=num_ch,
        interpret=jax.default_backend() == "cpu",
    )

    def band_render(params, alive_in, override, bg_in, m2d_off):
        band = jax.lax.axis_index(axis)
        return band_render_core(
            camera, params, alive_in, override, bg_in, m2d_off,
            band, band_rows, tile_shape, grid_w, budget, cfg, sh_degree,
        )

    shard = jax.shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    color, depth, final_t, n_contrib, overflow, radii = shard(
        params, alive, override_color, bg, mean2d_offset
    )
    # concatenated tile-major buffers: (ndev*band_rows*grid_w, ...) — global
    # tile order is band-major == row-major, so _untile works directly with
    # the padded grid height.
    full_cfg = CompositeConfig(
        tile_h=th, tile_w=tw, grid_h=ndev * band_rows, grid_w=grid_w,
        num_channels=num_ch, interpret=cfg.interpret,
    )
    return dict(
        render=_untile(color, full_cfg, camera.height, camera.width),
        depth=_untile(depth, full_cfg, camera.height, camera.width),
        final_T=_untile(final_t, full_cfg, camera.height, camera.width),
        n_contrib=_untile(n_contrib, full_cfg, camera.height, camera.width),
        overflow=jnp.sum(overflow),
        radii=jnp.max(radii, axis=0),
    )
