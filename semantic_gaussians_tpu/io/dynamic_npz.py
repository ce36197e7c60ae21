"""Dynamic-3DGS scene loading (CMU-Panoptic params.npz).

Parity: load_dynamic_npz (/root/reference/model/gaussian_model.py:346-378):
params.npz holds per-timestep means3D [T, N, 3], rgb_colors [T, N, 3],
unnorm_rotations [T, N, 4] plus static logit_opacities [N, 1], log_scales
[N, 1 or 3], and a foreground mask seg_colors (is_fg = seg[:, 0] > 0.5).
Returns a timestep-indexable structure over the shared capacity buffer.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams, round_capacity
from ..utils.sh import rgb_to_sh


@dataclasses.dataclass
class DynamicScene:
    means: np.ndarray  # [T, N, 3]
    colors: np.ndarray  # [T, N, 3]
    rotations: np.ndarray  # [T, N, 4]
    opacity_logits: np.ndarray  # [N, 1]
    log_scales: np.ndarray  # [N, 3]
    is_fg: np.ndarray  # [N] bool
    capacity: int

    @property
    def num_timesteps(self) -> int:
        return self.means.shape[0]

    def params_at(self, t: int, sh_degree: int = 0):
        """(GaussianParams, alive) for timestep t (SH degree 0: colors only,
        like the reference's dynamic path)."""
        n = self.means.shape[1]
        cap = self.capacity
        k = (sh_degree + 1) ** 2

        def pad(x, fill=0.0):
            out = np.full((cap,) + x.shape[1:], fill, np.float32)
            out[:n] = x
            return jnp.asarray(out)

        params = GaussianParams(
            means=pad(self.means[t]),
            sh_dc=pad(np.asarray(rgb_to_sh(self.colors[t]))[:, None, :]),
            sh_rest=jnp.zeros((cap, k - 1, 3), jnp.float32),
            log_scales=pad(self.log_scales),
            quats=pad(self.rotations[t]),
            opacity_logits=pad(self.opacity_logits, fill=-20.0),
        )
        alive = jnp.asarray(np.arange(cap) < n)
        return params, alive

    def foreground_mask(self) -> jnp.ndarray:
        out = np.zeros(self.capacity, bool)
        out[: len(self.is_fg)] = self.is_fg
        return jnp.asarray(out)


def load_dynamic_npz(path, capacity: Optional[int] = None) -> DynamicScene:
    data = np.load(path)
    means = np.asarray(data["means3D"], np.float32)
    colors = np.asarray(data["rgb_colors"], np.float32)
    rotations = np.asarray(data["unnorm_rotations"], np.float32)
    opacity = np.asarray(data["logit_opacities"], np.float32)
    if opacity.ndim == 1:
        opacity = opacity[:, None]
    log_scales = np.asarray(data["log_scales"], np.float32)
    if log_scales.shape[-1] == 1:
        log_scales = np.repeat(log_scales, 3, axis=-1)
    seg = np.asarray(data["seg_colors"], np.float32)
    is_fg = seg[:, 0] > 0.5
    n = means.shape[1]
    return DynamicScene(
        means=means,
        colors=colors,
        rotations=rotations,
        opacity_logits=opacity,
        log_scales=log_scales,
        is_fg=is_fg,
        capacity=capacity or round_capacity(n),
    )
