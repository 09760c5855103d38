"""Checkpoint / resume.

Absent in the reference (model state lives only in live NumPy arrays,
SURVEY.md §5); first-class here: the whole model — synapse pool,
permanences, duty cycles, recurrent masks, RNG key — is one pytree, so a
checkpoint is a faithful snapshot of a training stream mid-sequence.

Uses orbax if available, with a plain .npz fallback so checkpointing
never depends on optional machinery. Typed PRNG-key leaves are stored as
their raw uint32 key data and re-wrapped on restore.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _is_key(leaf) -> bool:
    try:
        return jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _unkey(tree):
    """Replace typed PRNG-key leaves with raw uint32 key data."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.random.key_data(leaf) if _is_key(leaf) else leaf,
        tree,
    )


def _rekey(tree, like):
    """Re-wrap key data for leaves that are typed keys in `like`."""
    return jax.tree_util.tree_map(
        lambda data, ref: (
            jax.random.wrap_key_data(jnp.asarray(data))
            if _is_key(ref)
            else jnp.asarray(data).astype(ref.dtype)
        ),
        tree,
        like,
    )


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


def save(path: str, state, backend: str | None = None) -> None:
    """Save a state pytree. `path` is a directory (orbax) or created as
    one containing state.npz (fallback).

    ``backend``: None auto-selects (orbax if importable, else npz);
    ``"npz"`` forces the plain-file writer — use this for PER-PROCESS
    local-shard checkpoints in a `jax.distributed` job: orbax
    coordinates commits across all hosts (primary-host metadata +
    barriers), which is wrong when every process saves its own
    independent tree to its own path.
    """
    raw = jax.device_get(_unkey(state))
    if backend not in (None, "npz", "orbax"):
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if backend != "npz":
        try:
            import orbax.checkpoint as ocp

            ckpt = ocp.PyTreeCheckpointer()
            ckpt.save(os.path.abspath(os.path.join(path, "state")), raw,
                      force=True)
            return
        except Exception:
            if backend == "orbax":
                raise
    os.makedirs(path, exist_ok=True)
    items, _ = _flatten_with_paths(raw)
    np.savez_compressed(os.path.join(path, "state.npz"), **items)


def restore(path: str, like):
    """Restore a state pytree saved by `save`. `like` provides the
    structure/shapes/dtypes (e.g. a freshly initialized state)."""
    raw_like = _unkey(like)
    orbax_path = os.path.abspath(os.path.join(path, "state"))
    npz_path = os.path.join(path, "state.npz")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(orbax_path, item=jax.device_get(raw_like))
        return _rekey(restored, like)
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        items, treedef = _flatten_with_paths(raw_like)
        leaves = []
        for k, ref in items.items():
            arr = data[k]
            if arr.dtype.kind == "V":
                # extension dtypes (e.g. ml_dtypes bfloat16) round-trip
                # through npz as raw void bytes — view them back
                arr = arr.view(ref.dtype)
            leaves.append(arr)
        raw = jax.tree_util.tree_unflatten(treedef, leaves)
        return _rekey(raw, like)
    raise FileNotFoundError(f"no checkpoint at {path}")
