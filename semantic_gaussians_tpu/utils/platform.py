"""Backend selection + compile-cache setup shared by the CLI entry points.

The TPU sandbox force-sets JAX_PLATFORMS via a sitecustomize, so the usual
env var cannot select CPU; `jax.config.update("jax_platforms", ...)` issued
BEFORE the first backend touch can. `SGTPU_PLATFORM=cpu` gives every entry
point (train/fusion/distill/eval/viewer/tools) a CPU escape hatch — e.g. to
run the dense-backend pipeline while the TPU is unavailable, or for
reproducible host-only debugging.

Call `setup_backend()` before any other jax use. It also enables the
persistent compilation cache on non-CPU backends (cached CPU AOT
executables are not portable across hosts; TPU kernel compiles here go
through a slow remote service, so caching matters).
"""
from __future__ import annotations

import os
import pathlib

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent


def setup_backend(cache_dir: os.PathLike | None = None) -> str:
    """Apply SGTPU_PLATFORM (if set) and compile-cache config; returns the
    active backend name. Must run before the first jax backend touch."""
    import jax

    want = os.environ.get("SGTPU_PLATFORM")
    if want:
        jax.config.update("jax_platforms", want)
    backend = jax.default_backend()
    if backend != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir", str(cache_dir or _REPO / ".jax_cache")
        )
    return backend
