"""Pytree checkpointing: npz leaves + JSON treedef, plus best/final semantics.

The reference uses `torch.save` dicts {model_state_dict, optimizer_state_dict,
epoch, val_loss, config} (`train/train_hybrid.py:540-546`). Here a checkpoint
is a directory:

    <dir>/leaves.npz      flattened pytree leaves, keyed leaf_000...
    <dir>/structure.json  JSON tree spec (safe reconstruction) + metadata
                          (epoch, val_loss, config, state_mean/std, ...)
    <dir>/treedef.pkl     legacy exact treedef — only read when the JSON spec
                          is absent AND the caller passes allow_pickle=True

Loading never unpickles by default: the tree is rebuilt from the JSON spec
(dicts keyed and ordered as jax flattens them; tuples/NamedTuples rebuilt as
plain tuples, which flatten to the same leaf order). Optimizer states are
re-shaped against a fresh `optimizer.init(params)` on resume anyway
(`train/loop.py`), so losing the NamedTuple classes is harmless.

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


def _build_spec(tree: Any, counter: list) -> Any:
    """Recursive JSON spec mirroring jax's flatten order.

    jax.tree_util flattens dicts in sorted-key order, sequences in element
    order, and NamedTuples in field order — the spec records containers the
    same way so `leaf` indices line up with `tree_flatten`'s leaf list.
    """
    if tree is None:
        return {"kind": "none"}
    if isinstance(tree, dict):
        return {
            "kind": "dict",
            "items": [[k, _build_spec(tree[k], counter)] for k in sorted(tree)],
        }
    if isinstance(tree, tuple):  # incl. NamedTuples (field order == element order)
        return {"kind": "tuple", "items": [_build_spec(c, counter) for c in tree]}
    if isinstance(tree, list):
        return {"kind": "list", "items": [_build_spec(c, counter) for c in tree]}
    idx = counter[0]
    counter[0] += 1
    return {"kind": "leaf", "index": idx}


def _rebuild_from_spec(spec: Any, leaves) -> Any:
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "dict":
        return {k: _rebuild_from_spec(s, leaves) for k, s in spec["items"]}
    if kind == "tuple":
        return tuple(_rebuild_from_spec(s, leaves) for s in spec["items"])
    if kind == "list":
        return [_rebuild_from_spec(s, leaves) for s in spec["items"]]
    if kind == "leaf":
        return leaves[spec["index"]]
    raise ValueError(f"unknown spec kind: {kind}")


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
    counter = [0]
    spec = _build_spec(state, counter)
    assert counter[0] == len(leaves), (
        f"spec built {counter[0]} leaves, flatten found {len(leaves)} — "
        "state contains a container type the JSON spec doesn't model"
    )
    with open(path / "structure.json", "w") as f:
        json.dump(
            {"spec": spec, "treedef": str(treedef), "n_leaves": len(leaves),
             "metadata": metadata or {}},
            f,
            default=_default_json,
        )


def load_checkpoint(path: str, allow_pickle: bool = False) -> Tuple[Any, Dict[str, Any]]:
    """Load (state_pytree, metadata).

    allow_pickle: opt-in fallback for legacy checkpoints written before the
    JSON spec existed (reads <dir>/treedef.pkl — only for trusted files)."""
    path = Path(path)
    data = np.load(path / "leaves.npz")
    leaves = [data[f"leaf_{i:04d}"] for i in range(len(data.files))]
    with open(path / "structure.json") as f:
        doc = json.load(f)
    meta = doc["metadata"]
    if "spec" in doc:
        return _rebuild_from_spec(doc["spec"], leaves), meta
    if not allow_pickle:
        raise ValueError(
            f"{path} is a legacy checkpoint without a JSON tree spec; pass "
            "allow_pickle=True to unpickle treedef.pkl (trusted files only)"
        )
    import pickle

    with open(path / "treedef.pkl", "rb") as f:
        treedef = pickle.load(f)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
