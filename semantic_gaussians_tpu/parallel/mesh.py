"""Device mesh helpers.

The reference has NO distributed layer (SURVEY.md §2.1-E: single process,
single GPU, hard-coded "cuda"); this module is new design per the north star:
JAX collectives over ICI/DCN, mesh axes ("data",) for view/ray parallelism
(Gaussians replicated, gradients psum'd) with room for a ("data", "tile")
2D mesh once tile-band sharding lands.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)
