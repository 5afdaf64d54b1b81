"""Checkpoint/resume: the batched env state array *is* the checkpoint.

The 6-channel state is fully Markov (turn, pass bit, done flag and ko are
all inside the array — SURVEY §5.4), so saving (states, rng_key, step
counters, learner state) captures everything.  Restore is bit-exact.

Two backends: orbax (sharding-aware, async-capable, for pod runs) and a raw
``np.savez`` per host (dependency-light, used by tests).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def save_npz(path: str, tree: Dict[str, Any]) -> None:
    """Save a flat dict of arrays/pytrees to ``path`` (.npz)."""
    flat = {}
    for name, value in tree.items():
        leaves, treedef = jax.tree_util.tree_flatten(value)
        flat[f"__len__{name}"] = np.asarray(len(leaves))
        for i, leaf in enumerate(leaves):
            flat[f"{name}::{i}"] = np.asarray(leaf)
        flat[f"__def__{name}"] = np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def restore_npz(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore against a template dict with matching pytree structures."""
    data = np.load(path)
    out = {}
    for name, value in template.items():
        leaves, treedef = jax.tree_util.tree_flatten(value)
        restored = [data[f"{name}::{i}"] for i in range(len(leaves))]
        out[name] = jax.tree_util.tree_unflatten(treedef, restored)
    return out


def save_orbax(path: str, tree: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
