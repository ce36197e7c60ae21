"""Shared helpers for the tools/ scripts: backend setup + synthetic scenes.

Every smoke/bench script used to carry its own copy of the random-cloud
GaussianParams builder; they now share this one (TODO_ROUND2 hygiene note).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def setup(cpu: bool):
    """Force CPU or enable the TPU compile cache. Call before any jax use."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def random_cloud_params(n, seed=0, spread=(1.2, 0.9, 0.8), center=(0, 0, 4),
                        log_scale_range=(-4.0, -2.5), sh_rest_k=0):
    """Random GaussianParams cloud in front of an identity camera (the shape
    every smoke/bench here uses). Returns (params, alive, rng)."""
    import jax.numpy as jnp

    from semantic_gaussians_tpu.core.gaussians import GaussianParams

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.asarray(
        spread, np.float32
    ) + np.asarray(center, np.float32)
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=jnp.asarray(
            ((rng.uniform(size=(n, 3)).astype(np.float32) - 0.5) / 0.28209479)[
                :, None, :
            ]
        ),
        sh_rest=jnp.zeros((n, sh_rest_k, 3)),
        log_scales=jnp.asarray(
            rng.uniform(*log_scale_range, size=(n, 3)).astype(np.float32)
        ),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.asarray(
            rng.uniform(-1.0, 1.5, size=(n, 1)).astype(np.float32)
        ),
    )
    import jax.numpy as _jnp

    alive = _jnp.ones((n,), bool)
    return params, alive, rng
