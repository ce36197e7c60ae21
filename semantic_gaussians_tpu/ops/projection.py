"""Per-Gaussian projection ("preprocess") — fully vectorized, differentiable JAX.

TPU-native equivalent of preprocessCUDA / computeCov2D / computeCov3D
(/root/reference/submodules/rgbd-rasterization/cuda_rasterizer/forward.cu:74-256).
One fused XLA program over all N Gaussians instead of one CUDA thread each; the
backward pass is pure autodiff (the CUDA backward.cu:141-391 hand-derivation is
unnecessary — clamps/gates become subgradients of jnp.clip/maximum, which
matches the reference's explicit gradient gating).

Constants matching the reference:
  near cull at view z <= 0.2 (auxiliary.h:154), FOV clamp 1.3*tan (forward.cu:85-89),
  +0.3 px low-pass on cov2D diagonal (forward.cu:110-111), eigenvalue floor 0.1 and
  radius = ceil(3*sigma_max) (forward.cu:229-232), ndc2Pix(v,S) = ((v+1)S-1)/2.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.sh import eval_sh

NEAR_CULL_Z = 0.2
LOWPASS = 0.3
EIG_FLOOR = 0.1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Per-Gaussian screen-space quantities (all [N, ...])."""

    means2d: jnp.ndarray  # [N, 2] pixel coords
    depths: jnp.ndarray  # [N] view-space z
    conics: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    opacities: jnp.ndarray  # [N]
    colors: jnp.ndarray  # [N, C]
    radii: jnp.ndarray  # [N] int32 pixel radius (0 = culled); the
    # reference's circular ceil(3*sigma_max) — visibility/densify-stat parity
    radii_xy: jnp.ndarray  # [N, 2] int32 per-axis rect half-extents used for
    # tile binning (tighter than the circle; see project_gaussians)
    cull_ellipse: Optional[jnp.ndarray] = None  # [N, 3] conic / r_mah^2:
    # normalized quadratic whose unit level set is the alpha >= 1/255
    # support ellipse — drives the exact tile-ellipse pair cull in binning
    # (ops.expand module doc). Zero rows (non-emitting) never cull.


def _ewa_rows(means, world_view, focal_x, focal_y, tan_fov_x, tan_fov_y):
    """The two rows u, v of JW as per-component (N,) arrays.

    J's rows are sparse ([fx/z, 0, -fx*tx/z^2] and [0, fy/z, -fy*ty/z^2]), so
    row0(JW) = (fx/z)*W[0,:] + (-fx*tx/z^2)*W[2,:] — a 2-term combination of
    *constant* camera rows. Keeping everything as (N,) component arrays avoids
    the (N,2,3)/(N,3,3) batched matmuls XLA lowers as bf16 convolution fusions
    with layout copies (measured ~4.5 ms of the 100k-Gaussian step).
    """
    W = world_view[:3, :3]
    t = means @ W.T + world_view[:3, 3]
    # Culled Gaussians (z <= 0.2) still flow through this math with static
    # shapes; give them a safe denominator so no inf/NaN leaks into autodiff
    # (forward masking alone does not stop NaN cotangents through jnp.where).
    tz = jnp.where(t[:, 2] > NEAR_CULL_Z, t[:, 2], 1.0)
    limx = 1.3 * tan_fov_x
    limy = 1.3 * tan_fov_y
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz
    inv_z = 1.0 / tz
    a1 = focal_x * inv_z
    b1 = -focal_x * tx * inv_z * inv_z
    a2 = focal_y * inv_z
    b2 = -focal_y * ty * inv_z * inv_z
    u = tuple(a1 * W[0, j] + b1 * W[2, j] for j in range(3))
    v = tuple(a2 * W[1, j] + b2 * W[2, j] for j in range(3))
    return u, v


def compute_cov2d(
    means: jnp.ndarray,
    cov3d6: jnp.ndarray,  # [N, 6] packed (xx, xy, xz, yy, yz, zz)
    world_view: jnp.ndarray,  # [4, 4]
    focal_x: float,
    focal_y: float,
    tan_fov_x: float,
    tan_fov_y: float,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to 2D: returns [N, 3] (a, b, c).

    cov2d = J W Sigma W^T J^T + 0.3*I (forward.cu:74-113), evaluated fully
    elementwise (see _ewa_rows): a = u^T Sigma u, b = u^T Sigma v,
    c = v^T Sigma v over the packed 6-vector.
    """
    u, v = _ewa_rows(means, world_view, focal_x, focal_y, tan_fov_x, tan_fov_y)
    xx, xy, xz, yy, yz, zz = (cov3d6[:, i] for i in range(6))

    def quad(p, q):
        return (
            xx * p[0] * q[0]
            + yy * p[1] * q[1]
            + zz * p[2] * q[2]
            + xy * (p[0] * q[1] + p[1] * q[0])
            + xz * (p[0] * q[2] + p[2] * q[0])
            + yz * (p[1] * q[2] + p[2] * q[1])
        )

    a = quad(u, u) + LOWPASS
    b = quad(u, v)
    c = quad(v, v) + LOWPASS
    return jnp.stack([a, b, c], axis=-1)


def compute_cov2d_from_scales_quats(
    means: jnp.ndarray,
    scales: jnp.ndarray,  # [N, 3] (activated, incl. scaling_modifier)
    quats: jnp.ndarray,  # [N, 4] raw
    world_view: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fov_x: float,
    tan_fov_y: float,
) -> jnp.ndarray:
    """Fused EWA path: Sigma = R diag(s^2) R^T never materialized; with
    L = R diag(s), a = |L^T u|^2, b = (L^T u)·(L^T v), c = |L^T v|^2 — all
    (N,) component arithmetic (no batched matmuls; exact f32 on the VPU,
    unlike the MXU's default bf16x3 passes)."""
    from ..utils.transforms import normalize_quat

    u, v = _ewa_rows(means, world_view, focal_x, focal_y, tan_fov_x, tan_fov_y)
    q = normalize_quat(quats)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # C[i] = column i of the rotation matrix (quat_to_rotmat convention):
    # C[i][j] = Rmat[j][i].
    C = (
        (1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)),
        (2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)),
        (2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)),
    )
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]

    def ltdot(p):  # (L^T p)_i = s_i * (col_i . p)
        return tuple(
            s * (C[i][0] * p[0] + C[i][1] * p[1] + C[i][2] * p[2])
            for i, s in enumerate((s0, s1, s2))
        )

    lu, lv = ltdot(u), ltdot(v)
    a = lu[0] * lu[0] + lu[1] * lu[1] + lu[2] * lu[2] + LOWPASS
    b = lu[0] * lv[0] + lu[1] * lv[1] + lu[2] * lv[2]
    c = lv[0] * lv[0] + lv[1] * lv[1] + lv[2] * lv[2] + LOWPASS
    return jnp.stack([a, b, c], axis=-1)


def project_gaussians(
    means: jnp.ndarray,  # [N, 3]
    scales: jnp.ndarray,  # [N, 3] (activated)
    quats: jnp.ndarray,  # [N, 4] (raw; normalized inside cov build)
    opacities: jnp.ndarray,  # [N] (activated)
    world_view: jnp.ndarray,  # [4, 4]
    full_proj: jnp.ndarray,  # [4, 4]
    camera_center: jnp.ndarray,  # [3]
    img_width: int,
    img_height: int,
    tan_fov_x: float,
    tan_fov_y: float,
    *,
    sh_coeffs: Optional[jnp.ndarray] = None,  # [N, K, 3]
    sh_degree: int = 3,
    override_color: Optional[jnp.ndarray] = None,  # [N, C]
    cov3d_precomp: Optional[jnp.ndarray] = None,  # [N, 6] packed
    scaling_modifier: float = 1.0,
    alive: Optional[jnp.ndarray] = None,  # [N] bool
    mean2d_offset: Optional[jnp.ndarray] = None,  # [N, 2] zeros; its grad is
    # dL/dmean2D — the functional analogue of the reference's dummy
    # screenspace_points tensor (renderer.py:37-41) used for densify stats.
) -> ProjectedGaussians:
    """Project all Gaussians to screen space. Culled entries get radius 0 and
    opacity 0, so downstream stages can treat them uniformly (no compaction —
    static shapes for XLA)."""
    focal_x = img_width / (2.0 * tan_fov_x)
    focal_y = img_height / (2.0 * tan_fov_y)

    # View-space position and near culling.
    p_view = means @ world_view[:3, :3].T + world_view[:3, 3]
    depths = p_view[:, 2]
    in_front = depths > NEAR_CULL_Z

    # Clip-space -> NDC -> pixels (forward.cu:197-200, ndc2Pix auxiliary.h).
    p_hom = means @ full_proj[:3, :3].T + full_proj[:3, 3]
    p_w = means @ full_proj[3, :3] + full_proj[3, 3]
    p_w_safe = jnp.where(jnp.abs(p_w) > 1e-6, p_w, 1e-6)
    rw = 1.0 / (p_w_safe + 1e-7)
    ndc = p_hom * rw[:, None]
    means2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * img_width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * img_height - 1.0) * 0.5,
        ],
        axis=-1,
    )
    if mean2d_offset is not None:
        means2d = means2d + mean2d_offset

    # 3D covariance -> 2D conic (elementwise EWA; no (N,3,3) tensors).
    if cov3d_precomp is not None:
        cov2d = compute_cov2d(
            means, cov3d_precomp, world_view, focal_x, focal_y,
            tan_fov_x, tan_fov_y,
        )
    else:
        cov2d = compute_cov2d_from_scales_quats(
            means, scales * scaling_modifier, quats, world_view,
            focal_x, focal_y, tan_fov_x, tan_fov_y,
        )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, EIG_FLOOR))
    lambda_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    valid = in_front & det_ok
    if alive is not None:
        valid = valid & alive
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # Per-axis, opacity-aware rect half-extents (binning only; `radii` above
    # keeps the reference's circular radius for visibility semantics).
    # alpha >= 1/255 requires exp(-d_M^2/2) >= 1/(255*op), and the maximum of
    # the quadratic form over the other axis is the marginal -dx^2/(2*Sxx),
    # so |dx| <= sigma_x * sqrt(2*ln(255*op)) is a hard support bound: every
    # pixel outside it fails the kernel's alpha cutoff. Clipping each axis at
    # min(ceil(3*sigma_max), ceil(that)) therefore changes NOTHING in the
    # output (contributor sets are identical) while cutting pair counts —
    # ~2x for anisotropic splats, ~5x for low-opacity ones (op=0.01 =>
    # 1.37 sigma). Tighter than getRect's square (auxiliary.h:46-56), which
    # pays full-circle binning for pixels its own alpha test then rejects.
    opac_m = jnp.where(valid, opacities, 0.0)
    r_mah2 = 2.0 * jnp.log(jnp.maximum(255.0 * opac_m, 1.0))  # >= 0
    r_mah = jnp.sqrt(r_mah2)
    rx = jnp.minimum(radius_f, jnp.ceil(r_mah * jnp.sqrt(jnp.maximum(a, 0.0))))
    ry = jnp.minimum(radius_f, jnp.ceil(r_mah * jnp.sqrt(jnp.maximum(c, 0.0))))
    radii_xy = jnp.where(
        (valid & (r_mah2 > 0.0))[:, None],
        jnp.stack([rx, ry], axis=-1),
        0.0,
    ).astype(jnp.int32)

    # Colors: SH evaluated toward the camera, clamped at 0 (forward.cu:20-71),
    # or a caller-provided override (feature rendering).
    if override_color is not None:
        colors = override_color
    else:
        assert sh_coeffs is not None
        dirs = means - camera_center[None, :]
        # sqrt(sum+eps): jnp.linalg.norm has a NaN gradient at exactly 0
        # (dead padded Gaussians can sit on the camera center).
        dirs = dirs / jnp.sqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20
        )
        # eval_sh wants [..., C, K]
        raw = eval_sh(sh_degree, jnp.swapaxes(sh_coeffs, -1, -2), dirs) + 0.5
        colors = jnp.maximum(raw, 0.0)

    # Normalized support quadratic for the exact tile-ellipse pair cull:
    # q(d)/r^2 with q the composite kernel's Mahalanobis form and r^2 the
    # alpha-cutoff level (both above). Zeroed when r^2 == 0 (op <= 1/255:
    # emits no pairs anyway) so the cull test is a no-op there.
    inv_r2 = jnp.where(r_mah2 > 0.0, 1.0 / jnp.maximum(r_mah2, 1e-20), 0.0)
    cull_ellipse = conics * inv_r2[:, None]

    return ProjectedGaussians(
        means2d=means2d,
        depths=depths,
        conics=conics,
        opacities=opac_m,
        colors=colors,
        radii=radii,
        radii_xy=radii_xy,
        cull_ellipse=cull_ellipse,
    )


def mark_visible(
    means: jnp.ndarray, world_view: jnp.ndarray, full_proj: jnp.ndarray
) -> jnp.ndarray:
    """[N] bool frustum visibility — markVisible parity
    (rgbd rasterize_points.cu:204-223 / checkFrustum, auxiliary.h:139-164):
    near-plane test on view z plus a loose +/-1.3 NDC bound."""
    p_view = means @ world_view[:3, :3].T + world_view[:3, 3]
    p_hom = means @ full_proj[:3, :3].T + full_proj[:3, 3]
    p_w = means @ full_proj[3, :3] + full_proj[3, 3]
    rw = 1.0 / (jnp.where(jnp.abs(p_w) > 1e-7, p_w, 1e-7))
    ndc = p_hom * rw[:, None]
    in_front = p_view[:, 2] > NEAR_CULL_Z
    in_box = (jnp.abs(ndc[:, 0]) < 1.3) & (jnp.abs(ndc[:, 1]) < 1.3)
    return in_front & in_box
