"""Checkpoint / resume for on-device state.

The reference's query state checkpoints through the API database
(query_result rows with the JSON bootstrapped target — SURVEY.md §5.4);
that contract is preserved in the service layer. This module covers the
state the reference never had: training state and converted model weights,
via Orbax (with a numpy fallback when Orbax is unavailable).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np

log = logging.getLogger(__name__)


def save_train_state(path: str, params: Any, opt_state: Any,
                     step: int) -> None:
    """Save {params, opt_state, step} to `path` (Orbax if available)."""
    state = {"params": params, "opt_state": opt_state,
             "step": np.asarray(step)}
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), state, force=True)
        ckpt.wait_until_finished()
        return
    except Exception as exc:  # pragma: no cover - fallback path
        log.warning("orbax save failed (%s); using npz fallback", exc)
    _save_npz(path, state)


def load_train_state(path: str, like: Any | None = None) -> dict:
    """Load a train state saved by save_train_state. `like` (a pytree with
    the same structure) enables Orbax restore typing."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        if like is not None:
            return ckpt.restore(os.path.abspath(path), target=like)
        return ckpt.restore(os.path.abspath(path))
    except Exception as exc:
        log.warning("orbax load failed (%s); trying npz fallback", exc)
    return _load_npz(path)


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree.flatten_with_path(tree)
    for path, leaf in leaves:
        key = prefix + "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _save_npz(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    import pickle

    leaves, treedef = jax.tree.flatten(state)
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(pickle.dumps(treedef), np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def _load_npz(path: str) -> dict:
    import pickle

    f = np.load(path if path.endswith(".npz") else path + ".npz")
    treedef = pickle.loads(f["treedef"].tobytes())
    leaves = [f[f"leaf_{i}"] for i in range(len(f.files) - 1)]
    return jax.tree.unflatten(treedef, leaves)
