"""Quaternion / rotation / covariance math for 3D Gaussians.

Parity targets: /root/reference/utils/general_utils.py:66-115 (build_rotation,
build_scaling_rotation, strip_symmetric) and the covariance construction in
/root/reference/submodules/*/cuda_rasterizer/forward.cu (computeCov3D).
Everything is batched jnp, differentiable, and shaped for vmap/jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions [..., 4] stored as (w, x, y, z)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion (w, x, y, z); branch-free.

    Uses the 4-candidate construction (stable for all traces) so it jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    qw = jnp.sqrt(jnp.clip(1 + m00 + m11 + m22, 0)) / 2
    qx = jnp.sqrt(jnp.clip(1 + m00 - m11 - m22, 0)) / 2
    qy = jnp.sqrt(jnp.clip(1 - m00 + m11 - m22, 0)) / 2
    qz = jnp.sqrt(jnp.clip(1 - m00 - m11 + m22, 0)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return normalize_quat(jnp.stack([qw, qx, qy, qz], axis=-1))


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): [..., 3, 3]. Reference general_utils.py:106-115."""
    R = quat_to_rotmat(normalize_quat(quats))
    return R * scales[..., None, :]


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Sigma = L @ L^T = R diag(s^2) R^T, full [..., 3, 3] (symmetric PSD)."""
    L = build_scaling_rotation(scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> 6-vector (xx, xy, xz, yy, yz, zz).

    Same packing order as the reference (general_utils.py:66-79) and the CUDA
    cov3D precomp layout.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """6-vector (xx, xy, xz, yy, yz, zz) -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (v[..., i] for i in range(6))
    r0 = jnp.stack([xx, xy, xz], axis=-1)
    r1 = jnp.stack([xy, yy, yz], axis=-1)
    r2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1 - x))
