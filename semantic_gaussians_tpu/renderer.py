"""Camera-level render API.

Parity surface: /root/reference/model/renderer.py render() (:20-130) and
render_chn() (:134-246) — scaling_modifier, override_color, override_shape,
foreground mask, world_rotate, bg color, and N-channel feature rendering —
re-expressed functionally over GaussianParams.

The reference returns screenspace_points whose .grad carries the mean2D
gradient for densification (renderer.py:37-41); here densification stats are
taken from the projection VJP directly (see core/densify.py), so the output
dict carries `radii` and the caller differentiates through `render`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core.gaussians import GaussianParams
from .ops.projection import project_gaussians
from .ops.rasterize import DEFAULT_TILE, rasterize
from .utils.camera import Camera
from .utils.transforms import build_covariance_3d, strip_symmetric


def render(
    camera: Camera,
    params: GaussianParams,
    alive: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    *,
    scaling_modifier: float = 1.0,
    active_sh_degree: Optional[int] = None,
    override_color: Optional[jnp.ndarray] = None,  # [N, C] -> feature render
    override_shape: Optional[Tuple[int, int]] = None,  # (width, height)
    foreground: Optional[jnp.ndarray] = None,  # [N] bool; False -> opacity 0
    world_rotate: Optional[jnp.ndarray] = None,  # [3, 3]
    tile_shape: Tuple[int, int] = DEFAULT_TILE,
    pair_budget: Optional[int] = None,
    backend: str = "pallas",
    mean2d_offset: Optional[jnp.ndarray] = None,  # [N,2] zeros (densify stats)
    debug: bool = False,  # snapshot inputs on non-finite output (see below)
) -> dict:
    """Render RGB(+median depth) or N-channel features from one camera.

    Returns dict(render [H,W,C], depth, final_T, n_contrib, radii [N],
    overflow).
    """
    if override_shape is not None:
        camera = camera.resized(override_shape[0], override_shape[1])
    if bg is None:
        num_ch = 3 if override_color is None else override_color.shape[-1]
        bg = jnp.zeros(num_ch, jnp.float32)

    opac = params.opacity[:, 0]
    if foreground is not None:
        # reference: opacity zeroed outside the foreground (renderer.py:74-76)
        opac = opac * foreground.astype(opac.dtype)

    means = params.means
    cov3d_precomp = None
    if world_rotate is not None:
        # Rotate the scene: means and covariance (renderer.py:88-93,
        # gaussian_model.py:140-144 get_covariance_rotation).
        means = means @ world_rotate  # row-vector convention, R^T @ p
        cov = build_covariance_3d(params.scales * scaling_modifier, params.quats)
        cov = world_rotate.T @ cov @ world_rotate
        cov3d_precomp = strip_symmetric(cov)

    sh_degree = (
        params.max_sh_degree if active_sh_degree is None else active_sh_degree
    )
    proj = project_gaussians(
        means,
        params.scales,
        params.quats,
        opac,
        camera.world_view,
        camera.full_proj,
        camera.camera_center,
        camera.width,
        camera.height,
        camera.tan_half_fov_x,
        camera.tan_half_fov_y,
        sh_coeffs=None if override_color is not None else params.sh_coeffs,
        sh_degree=sh_degree,
        override_color=override_color,
        cov3d_precomp=cov3d_precomp,
        scaling_modifier=scaling_modifier,
        alive=alive,
        mean2d_offset=mean2d_offset,
    )
    out = rasterize(
        proj,
        bg,
        camera.width,
        camera.height,
        tile_shape=tile_shape,
        pair_budget=pair_budget,
        backend=backend,
    )
    out["radii"] = proj.radii
    if debug:
        # Debug-snapshot parity with the reference rasterizer's
        # snapshot_fw.dump on CUDA exceptions (channel __init__.py:86-100):
        # if the render goes non-finite, dump all inputs for offline repro.
        # jax.debug.callback (not np.asarray) so the flag also works inside
        # the always-jitted production paths — the one place it's needed;
        # materializing a tracer here raised TracerArrayConversionError.
        import numpy as _np

        def _snapshot(img, **arrays):
            if _np.isfinite(img).all():
                return
            path = "/tmp/sgtpu_snapshot_fw.npz"
            _np.savez(path, **arrays)
            raise FloatingPointError(
                f"non-finite render; inputs snapshotted to {path}"
            )

        jax.debug.callback(
            _snapshot,
            out["render"],
            means=params.means,
            log_scales=params.log_scales,
            quats=params.quats,
            opacity_logits=params.opacity_logits,
            sh_dc=params.sh_dc,
            sh_rest=params.sh_rest,
            world_view=camera.world_view,
            full_proj=camera.full_proj,
            bg=bg,
        )
    return out


def render_many(
    cam_stack: Camera,
    params: GaussianParams,
    alive: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    **kw,
) -> dict:
    """Render a STACK of K cameras in one traced computation (lax.map).

    `cam_stack` is a Camera whose array leaves carry a leading K axis with
    static fields (sizes/FoVs) shared — build it with
    pipelines.train.stack_camera_chunk. Outputs gain a leading K axis.

    Per-view dispatch costs ~90 ms over this sandbox's remote tunnel (and
    ~1 ms even on local hardware); mapping K views into one dispatch
    amortizes it Kx for the fusion / eval / serving paths, the same trick
    train_scan_step plays for training. Intermediates (pair stream, tile
    buffers) are reused across map iterations, so peak memory matches a
    single render plus the stacked outputs.
    """

    def body(cam):
        return render(cam, params, alive=alive, bg=bg, **kw)

    return jax.lax.map(body, cam_stack)


def render_chn(
    camera: Camera,
    params: GaussianParams,
    features: jnp.ndarray,  # [N, C]
    alive: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    **kw,
) -> dict:
    """N-channel feature rasterization (reference render_chn, renderer.py:134).

    Unlike the reference (backward compiled for 3 channels only), gradients
    w.r.t. `features` are correct for any C.
    """
    return render(camera, params, alive=alive, bg=bg, override_color=features, **kw)
