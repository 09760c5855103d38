"""Distal segment forward pass over the padded synapse pool.

Replaces the reference's dual-index "push/pull" scheme
(`projections.py:163-178`): the push-mode bincount over a reverse index
and the pull-mode gather both collapse into one pass over the padded
``(K, S)`` table — gather the presynaptic cell's activation bit for every
synapse slot, then reduce over the synapse axis K:

    potential[s]  = sum_k active[cell[k, s]]                 (potential count)
    connected[s]  = sum_k active[cell[k, s]] & (perm >= th)  (connected count)

Dead slots carry cell = -1 and are fetched as False via fill-mode take,
mirroring the reference's always-false padding slot trick
(`projections.py:70-77`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .masked import gather_or


def segment_counts(
    synapse_cell: jnp.ndarray,   # (K, S) int32, -1 = dead slot
    synapse_perm: jnp.ndarray,   # (K, S) float32
    active_mask: jnp.ndarray,    # (N,) bool cell activation
    permanence_threshold: float,
):
    """Returns (potential, connected_count), both (S,) int32.

    `potential` counts active synapses with any permanence >= 0 (all live
    slots — the reference destroys negative-permanence synapses, so live
    membership == potential membership, `projections.py:105-109`).
    `connected_count` additionally requires perm >= permanence_threshold
    (`projections.py:171-172`).
    """
    act = gather_or(active_mask, synapse_cell, False)
    potential = act.sum(axis=0, dtype=jnp.int32)
    connected = (act & (synapse_perm >= permanence_threshold)).sum(
        axis=0, dtype=jnp.int32
    )
    return potential, connected


def segment_forward(
    synapse_cell: jnp.ndarray,
    synapse_perm: jnp.ndarray,
    segment_owner: jnp.ndarray,  # (S,) int32, num_cells = unallocated
    active_mask: jnp.ndarray,    # (N,) bool
    num_cells: int,
    permanence_threshold: float,
    activation_threshold: int,
    matching_threshold: int,
):
    """Full distal forward step (`PredictiveProjection.process`,
    `projections.py:245-255`).

    Returns (potential, matching, seg_active, prediction):
      matching   = potential >= matching_threshold
      seg_active = matching & connected_count >= activation_threshold
      prediction = cell owns >= 1 active segment (the reference's bincount
                   of active segments over bundles, thresholded at
                   `networks.py:122`)
    """
    potential, connected = segment_counts(
        synapse_cell, synapse_perm, active_mask, permanence_threshold
    )
    matching = potential >= matching_threshold
    seg_active = matching & (connected >= activation_threshold)
    prediction = (
        jnp.zeros((num_cells,), jnp.bool_)
        .at[segment_owner]
        .max(seg_active, mode="drop")
    )
    return potential, matching, seg_active, prediction
