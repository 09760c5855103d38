"""Checkpoint / resume.

Absent in the reference (model state lives only in live NumPy arrays,
SURVEY.md §5); first-class here: the whole model — synapse pool,
permanences, duty cycles, recurrent masks, RNG key — is one pytree, so a
checkpoint is a faithful snapshot of a training stream mid-sequence.

Uses orbax if available, with a plain .npz fallback so checkpointing
never depends on optional machinery.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    items = {}
    for path, leaf in flat:
        key = "/".join(
            getattr(p, "name", None) or str(getattr(p, "idx", p))
            for p in path
        )
        items[key] = np.asarray(leaf)
    return items, treedef


def save(path: str, state) -> None:
    """Save a state pytree. `path` is a directory (orbax) or created as
    one containing state.npz (fallback)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(
            os.path.abspath(os.path.join(path, "state")),
            jax.device_get(state),
            force=True,
        )
        return
    except Exception:
        pass
    os.makedirs(path, exist_ok=True)
    items, _ = _flatten_with_paths(jax.device_get(state))
    np.savez_compressed(os.path.join(path, "state.npz"), **items)


def restore(path: str, like):
    """Restore a state pytree saved by `save`. `like` provides the
    structure/shapes/dtypes (e.g. a freshly initialized state)."""
    orbax_path = os.path.abspath(os.path.join(path, "state"))
    npz_path = os.path.join(path, "state.npz")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        target = jax.device_get(like)
        restored = ckpt.restore(orbax_path, item=target)
        return jax.tree_util.tree_map(
            lambda l, r: jax.numpy.asarray(r).astype(l.dtype), like, restored
        )
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        items, treedef = _flatten_with_paths(like)
        leaves = [
            jax.numpy.asarray(data[k]).astype(v.dtype)
            for k, v in items.items()
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    raise FileNotFoundError(f"no checkpoint at {path}")
