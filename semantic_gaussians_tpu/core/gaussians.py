"""Gaussian scene state as a functional pytree.

TPU-native re-design of the reference's GaussianModel
(/root/reference/model/gaussian_model.py:32-240): instead of mutable
nn.Parameters with in-place optimizer surgery, the state is an immutable
dataclass pytree with **capacity padding** — arrays are sized to a fixed
`capacity` with an `alive` mask, so XLA sees static shapes across
densify/prune and recompiles only when capacity doubles.

Activation conventions (gaussian_model.py:33-48):
  scales  = exp(log_scales)
  opacity = sigmoid(opacity_logits)
  quat    = normalize(quats)   (w, x, y, z)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_mean_sq_dist
from ..utils import sh as sh_utils
from ..utils.transforms import inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Trainable parameters. All arrays have leading dim = capacity."""

    means: jnp.ndarray  # [N, 3]
    sh_dc: jnp.ndarray  # [N, 1, 3]
    sh_rest: jnp.ndarray  # [N, K-1, 3]
    log_scales: jnp.ndarray  # [N, 3]
    quats: jnp.ndarray  # [N, 4] raw (normalized on use)
    opacity_logits: jnp.ndarray  # [N, 1]

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return int(round(k**0.5)) - 1

    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)

    @property
    def rotations(self) -> jnp.ndarray:
        n = jnp.linalg.norm(self.quats, axis=-1, keepdims=True)
        return self.quats / jnp.maximum(n, 1e-12)

    @property
    def sh_coeffs(self) -> jnp.ndarray:
        """[N, K, 3] full SH stack (dc first), reference layout."""
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)

    def base_colors(self) -> jnp.ndarray:
        """[N, 3] SH DC converted back to RGB."""
        return sh_utils.sh_to_rgb(self.sh_dc[:, 0, :])


def round_capacity(n: int, granule: int = 4096) -> int:
    """Static capacities come from a small set of sizes to bound recompiles."""
    return max(granule, -(-n // granule) * granule)


def init_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    init_opacity: float = 0.1,
) -> tuple[GaussianParams, jnp.ndarray]:
    """Create Gaussians from a point cloud; returns (params, alive mask).

    Parity with create_from_pcd (gaussian_model.py:150-186): SH DC from RGB,
    higher SH zero, log-scale = log sqrt(mean 3-NN squared distance) (isotropic),
    identity quaternion, opacity logit = inverse_sigmoid(0.1).
    """
    n = points.shape[0]
    cap = capacity or round_capacity(n)
    k = (sh_degree + 1) ** 2

    pts = jnp.asarray(points, jnp.float32)
    # Native C++ grid-hash KNN when available (runs once per scene; the
    # blocked TPU matmul KNN is kept as fallback but its compile alone can
    # dominate at 100k+ points).
    from ..io.native import knn3_native

    d2_host = knn3_native(np.asarray(points, np.float32))
    if d2_host is not None:
        dist2 = jnp.maximum(jnp.asarray(d2_host), 1e-7)
    else:
        dist2 = jnp.maximum(knn_mean_sq_dist(pts), 1e-7)
    log_scale = 0.5 * jnp.log(dist2)  # log(sqrt(d2))

    def pad(x, fill=0.0):
        shape = (cap,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[:n].set(x)

    means = pad(pts)
    sh_dc = pad(sh_utils.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :])
    sh_rest = jnp.zeros((cap, k - 1, 3), jnp.float32)
    log_scales = pad(jnp.tile(log_scale[:, None], (1, 3)))
    quats = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
    # Dead slots get a hugely negative logit so they are invisible even if a
    # kernel ever misses the alive mask.
    op = float(inverse_sigmoid(jnp.asarray(init_opacity)))
    opacity_logits = jnp.full((cap, 1), -20.0, jnp.float32).at[:n].set(op)

    alive = (jnp.arange(cap) < n)
    return (
        GaussianParams(means, sh_dc, sh_rest, log_scales, quats, opacity_logits),
        alive,
    )


def random_init(
    key: jax.Array, num_points: int = 100_000, sh_degree: int = 3
) -> tuple[GaussianParams, jnp.ndarray]:
    """Random cloud in the Blender-scene bounds (gaussian_model.py:152-160)."""
    k1, k2 = jax.random.split(key)
    xyz = jax.random.uniform(k1, (num_points, 3)) * 2.6 - 1.3
    shs = jax.random.uniform(k2, (num_points, 3)) / 255.0
    colors = sh_utils.sh_to_rgb(shs)
    return init_from_pcd(np.asarray(xyz), np.asarray(colors), sh_degree)


def packed_features(
    params: GaussianParams, alive: jnp.ndarray, feature_type: str = "all"
) -> jnp.ndarray:
    """Per-Gaussian feature vector for the 3D distill net.

    Parity: get_locs_and_features (gaussian_model.py:400-418) packs the RAW
    (pre-activation) parameters —
    "all":   [opacity_logit, f_dc(3), f_rest(45), log_scale(3), quat(4)] = 56
    "color": [f_dc(3), f_rest(45)] = 48   (for sh_degree 3)
    """
    f_dc = params.sh_dc.reshape(params.capacity, -1)
    f_rest = params.sh_rest.reshape(params.capacity, -1)
    if feature_type == "color":
        feats = jnp.concatenate([f_dc, f_rest], axis=-1)
    else:
        feats = jnp.concatenate(
            [params.opacity_logits, f_dc, f_rest, params.log_scales, params.quats],
            axis=-1,
        )
    return feats * alive[:, None]


def num_alive(alive: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(alive.astype(jnp.int32))


def create_semantic(capacity: int, num_channels: int = 768):
    """Zero per-Gaussian semantic features + visit counters
    (create_semantic parity, gaussian_model.py:188-194)."""
    return (
        jnp.zeros((capacity, num_channels), jnp.float32),
        jnp.zeros((capacity,), jnp.float32),
    )
