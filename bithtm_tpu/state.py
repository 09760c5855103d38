"""Model state pytrees.

Everything the reference keeps as live mutable NumPy arrays
(`projections.py:16,40-44,226-227`; `networks.py:57`) becomes one
immutable pytree threaded through a functional step, so the whole model
scans under `lax.scan`, vmaps over independent streams, checkpoints as a
pytree, and shards with `jax.sharding`.

Layout notes (TPU):
  * Synapse tables are **synapse-major** ``(K, S)`` so the long, padded
    segment axis S (a multiple of 128) is the lane dimension. The
    reference stores segment-major ragged rows (`projections.py:42-44`).
  * Cell-indexed vectors are flat ``(num_cells,)``; reshape to
    ``(column_dim, cell_dim)`` is free.
  * Sentinels: ``synapse_cell == -1`` marks a dead/free synapse slot
    (reference: packed `invalid_output_edge`, `projections.py:36`);
    ``segment_owner == num_cells`` marks an unallocated segment slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .config import HTMConfig, SPConfig, TMConfig


class SPState(struct.PyTreeNode):
    """Spatial pooler parameters + homeostasis.

    ``permanence`` is the learnable proximal matrix (`projections.py:16`);
    ``connected`` caches ``permanence >= threshold`` as int8 so the hot
    forward overlap is an int8 MXU matmul without re-reading f32 weights;
    ``duty_cycle`` is the boosting EMA (`regularizations.py:13`).
    """

    permanence: jax.Array   # (C, I) float32
    connected: jax.Array    # (C, I) int8 (cached permanence >= threshold)
    duty_cycle: jax.Array   # (C,) float32


class TMState(struct.PyTreeNode):
    """Temporal memory synapse pool + recurrent state.

    Pool (replaces `SparseProjection`'s dual-index DynamicArray2D graph,
    `projections.py:27-44`):
      synapse_cell: (K, S) int32 presynaptic cell per synapse slot, -1 free
      synapse_perm: (K, S) float32 permanence, -1.0 where free
      segment_owner: (S,) int32 owner cell (segment_bundle,
        `projections.py:226`), num_cells where unallocated

    Recurrent state (mirrors `TemporalMemory.State`, `networks.py:39-46`,
    and the distal `PredictiveProjection.State`, `projections.py:195-203`):
      active_mask: (N,) bool   cell activation this step
      winner_mask: (N,) bool   winner cells this step
      prediction:  (N,) bool   cell predictive state for next step
      segment_potential: (S,) int32  potential-synapse counts
      segment_matching:  (S,) bool   potential >= matching_threshold
      segment_active:    (S,) bool   connected-active >= activation_threshold
      step: () int32  timestep counter; step 0 has no previous distal
        state, so learning is skipped exactly like the reference's
        `update(prev_state=None)` early-return (`projections.py:258-259`).
    """

    synapse_cell: jax.Array
    synapse_perm: jax.Array
    segment_owner: jax.Array

    active_mask: jax.Array
    winner_mask: jax.Array
    prediction: jax.Array
    segment_potential: jax.Array
    segment_matching: jax.Array
    segment_active: jax.Array
    step: jax.Array


class HTMState(struct.PyTreeNode):
    """Full model state: one independent HTM stream (vmap for a batch)."""

    sp: SPState
    tm: TMState
    key: jax.Array  # PRNG key consumed by jittered tie-breaks and sampling


def sp_init(key: jax.Array, cfg: SPConfig) -> SPState:
    """Gaussian proximal permanences, N(mean, std^2) (`projections.py:16`)."""
    perm = (
        jax.random.normal(key, (cfg.column_dim, cfg.input_dim), jnp.float32)
        * cfg.permanence_std
        + cfg.permanence_mean
    )
    connected = (perm >= cfg.permanence_threshold).astype(jnp.int8)
    return SPState(
        permanence=perm,
        connected=connected,
        duty_cycle=jnp.zeros((cfg.column_dim,), jnp.float32),
    )


def tm_init(cfg: TMConfig) -> TMState:
    """Empty pool: zero segments, zero synapses (`projections.py:28-44`
    starts with zero output rows; `networks.py:59-65` empty state)."""
    K, S, N = cfg.synapse_capacity, cfg.segment_capacity, cfg.num_cells
    return TMState(
        synapse_cell=jnp.full((K, S), -1, jnp.int32),
        synapse_perm=jnp.full((K, S), -1.0, jnp.float32),
        segment_owner=jnp.full((S,), N, jnp.int32),
        active_mask=jnp.zeros((N,), jnp.bool_),
        winner_mask=jnp.zeros((N,), jnp.bool_),
        prediction=jnp.zeros((N,), jnp.bool_),
        segment_potential=jnp.zeros((S,), jnp.int32),
        segment_matching=jnp.zeros((S,), jnp.bool_),
        segment_active=jnp.zeros((S,), jnp.bool_),
        step=jnp.zeros((), jnp.int32),
    )


def htm_init(key: jax.Array, cfg: HTMConfig) -> HTMState:
    sp_key, state_key = jax.random.split(key)
    return HTMState(sp=sp_init(sp_key, cfg.sp), tm=tm_init(cfg.tm), key=state_key)


def htm_init_batch(key: jax.Array, cfg: HTMConfig, batch: int) -> HTMState:
    """A batch of independent streams: vmap of htm_init over split keys."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: htm_init(k, cfg))(keys)
