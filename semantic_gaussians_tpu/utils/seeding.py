"""Deterministic seeding (reference utils/system_utils.py:36-43 analogue).

JAX is functionally random, so the main artifact is a root PRNG key; we also
seed python/numpy for host-side shuffles and data augmentation.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
