"""Pytree checkpointing: npz leaves + JSON treedef, plus best/final semantics.

The reference uses `torch.save` dicts {model_state_dict, optimizer_state_dict,
epoch, val_loss, config} (`train/train_hybrid.py:540-546`). Here a checkpoint
is a directory:

    <dir>/leaves.npz      flattened pytree leaves, keyed leaf_000...
    <dir>/structure.json  treedef description + metadata (epoch, val_loss,
                          config, state_mean/std, ...)

Dependency-light and deterministic; Orbax is deliberately avoided for the
core path (its async machinery is overkill for <1 MB states) but the format
stays pure-pytree so swapping it in later is mechanical.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _default_json(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serialisable: {type(o)}")


def save_checkpoint(
    path: str,
    state: Any,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save an arbitrary pytree `state` plus JSON-able metadata."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path / "leaves.npz",
        **{f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(path / "structure.json", "w") as f:
        json.dump(
            {"treedef": str(treedef), "n_leaves": len(leaves), "metadata": metadata or {}},
            f,
            default=_default_json,
        )
    # Keep a pickled treedef for exact reconstruction.
    import pickle

    with open(path / "treedef.pkl", "wb") as f:
        pickle.dump(treedef, f)


def load_checkpoint(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load (state_pytree, metadata)."""
    import pickle

    path = Path(path)
    with open(path / "treedef.pkl", "rb") as f:
        treedef = pickle.load(f)
    data = np.load(path / "leaves.npz")
    leaves = [data[f"leaf_{i:04d}"] for i in range(len(data.files))]
    with open(path / "structure.json") as f:
        meta = json.load(f)["metadata"]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
