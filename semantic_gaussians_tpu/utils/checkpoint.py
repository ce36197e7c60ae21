"""First-class train-state checkpoint/resume.

The reference only snapshots PLYs and leaves optimizer capture/restore
commented out (SURVEY.md §5: gaussian_model.py:69-103, train.py:80-87) — no
real mid-run resume. Here the FULL TrainState (params, alive mask, Adam
moments, densification counters, step) round-trips through orbax (falling
back to pickle+npz if orbax is unavailable), alongside reference-compatible
PLY exports for interop.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path, state: Any) -> None:
    """Save any pytree (e.g. TrainState) to <path> (directory or file).

    The state is stored as its FLATTENED leaf list (order-stable): orbax
    restores nested dataclass trees as dicts whose flatten order need not
    match the original treedef, so round-tripping structured trees directly
    would silently permute leaves.
    """
    path = Path(path)
    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    try:
        import orbax.checkpoint as ocp

        path.parent.mkdir(parents=True, exist_ok=True)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path.resolve(), leaves, force=True)
    except Exception:
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(str(path) + ".pkl", "wb") as f:
            pickle.dump({"leaves": leaves}, f)


def load_state(path, like: Any) -> Any:
    """Load a pytree saved by save_state; `like` provides the structure."""
    path = Path(path)
    treedef = jax.tree.structure(like)
    if path.exists() and path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        leaves = ckptr.restore(path.resolve())
    else:
        with open(str(path) + ".pkl", "rb") as f:
            leaves = pickle.load(f)["leaves"]
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])


def latest_iteration(model_dir, prefix: str = "iteration_") -> Optional[int]:
    """searchForMaxIteration analogue (reference utils/system_utils.py)."""
    model_dir = Path(model_dir)
    if not model_dir.exists():
        return None
    iters = []
    for p in model_dir.iterdir():
        if p.name.startswith(prefix):
            try:
                iters.append(int(p.name[len(prefix):]))
            except ValueError:
                pass
    return max(iters) if iters else None
