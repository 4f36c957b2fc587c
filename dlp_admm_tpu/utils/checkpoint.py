"""Checkpoint / resume of MPC runs.

The reference has no checkpointing (SURVEY.md §5): state accumulates in
in-memory lists and the only cross-step carry is the warm-start shift. Here
the MPC carry — (xt, warm starts, bar_state pytree, step index) — is the
checkpoint unit; any planner's carry can be saved and restored mid-run.

Plain ``.npz`` is used (flattened pytree leaves + treedef JSON): no extra
dependencies, safe for array-only carries, works for batched/sharded runs
after a ``jax.device_get``.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_carry(path: str, carry, step: int) -> None:
    """Save an arbitrary array pytree + step counter to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x))
              for i, x in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    with open(path + ".tree", "w") as f:
        json.dump(dict(n_leaves=len(leaves), treedef=str(treedef)), f)


def load_carry(path: str, like):
    """Restore a carry saved by :func:`save_carry`.

    ``like`` is a pytree with the same structure (e.g. a freshly-initialized
    carry); its treedef is used to unflatten, and its leaf dtypes are
    re-applied so restored runs stay bit-compatible.

    The saved treedef and every leaf shape are validated against ``like``:
    a checkpoint from a different planner config must fail loudly here, not
    silently reshape downstream.
    """
    data = np.load(path)
    _, treedef = jax.tree.flatten(like)
    like_leaves = jax.tree.leaves(like)
    if os.path.exists(path + ".tree"):
        with open(path + ".tree") as f:
            saved = json.load(f)
        if saved["n_leaves"] != len(like_leaves):
            raise ValueError(
                f"checkpoint {path} has {saved['n_leaves']} leaves, "
                f"expected {len(like_leaves)} — saved from a different carry")
        if saved["treedef"] != str(treedef):
            raise ValueError(
                f"checkpoint {path} treedef mismatch:\n"
                f"  saved:    {saved['treedef']}\n"
                f"  expected: {treedef}")
    leaves = []
    for i, ref_leaf in enumerate(like_leaves):
        arr = data[f"leaf_{i}"]
        want = getattr(ref_leaf, "shape", None)
        if want is not None and tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"checkpoint {path} leaf {i} shape {arr.shape} != expected "
                f"{tuple(want)} — saved from a different planner config")
        leaves.append(jax.numpy.asarray(arr, getattr(ref_leaf, "dtype", None)))
    step = int(data["__step__"])
    return jax.tree.unflatten(treedef, leaves), step
