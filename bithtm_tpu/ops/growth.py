"""Segment allocation and synapse growth as masked static-shape ops.

These replace the dynamic-growth machinery of the reference:
  * `SparseProjection.add_output` (`projections.py:79-95`) — recycle
    low-synapse segments before appending fresh rows.
  * `SparseProjection.add_edge` (`projections.py:111-161`) — grow up to
    ``sampling - potential`` synapses per learning segment toward winner
    inputs, random priority without replacement, never duplicating an
    existing target.

The pool is pre-allocated, so "grow a fresh row" means "claim an
unallocated slot"; the recycle-before-grow ordering is preserved by
ranking candidate slots with the key (allocated-recyclable first,
ascending index) — identical to the reference's np.where scan order over
existing rows followed by appended rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masked import gather_or, slot_fill


def allocate_segments(
    segment_owner: jnp.ndarray,     # (S,) int32, num_cells = unallocated
    synapse_count: jnp.ndarray,     # (S,) int32 live synapses per slot
    unaccounted_cells: jnp.ndarray, # (U,) int32 cells needing a segment
    unaccounted_valid: jnp.ndarray, # (U,) bool
    matching_threshold: int,
    num_cells: int,
):
    """Choose one pool slot per unaccounted winner cell.

    Eligible slots have synapse_count < matching_threshold — exactly
    `add_output`'s `edges_threshold` recycle rule (`projections.py:80`).
    (An eligible allocated slot can never be matching, so recycling never
    steals a segment that is in this step's learning/punished sets.)

    Returns (slots, assign_valid): `slots[i]` hosts `unaccounted_cells[i]`
    where `assign_valid[i]`; invalid entries point at slot S (drop).
    """
    S = segment_owner.shape[0]
    U = unaccounted_cells.shape[0]
    allocated = segment_owner < num_cells
    eligible = synapse_count < matching_threshold
    large = jnp.int32(3 * S)
    key = jnp.arange(S, dtype=jnp.int32) + S * (~allocated).astype(jnp.int32)
    key = jnp.where(eligible, key, large)
    neg_vals, slots = jax.lax.top_k(-key, U)
    assign_valid = unaccounted_valid & ((-neg_vals) < large)
    slots = jnp.where(assign_valid, slots, S).astype(jnp.int32)
    return slots, assign_valid


def grow_synapses(
    key: jax.Array,
    synapse_cell: jnp.ndarray,    # (K, S) int32
    synapse_perm: jnp.ndarray,    # (K, S) float32
    learn_idx: jnp.ndarray,       # (L,) int32 segment slots, S = invalid
    learn_valid: jnp.ndarray,     # (L,) bool
    winner_idx: jnp.ndarray,      # (W,) int32 prev winner cells, N = invalid
    winner_valid: jnp.ndarray,    # (W,) bool
    n_winners: jnp.ndarray,       # () int32 true prev-winner count
    prev_active: jnp.ndarray,     # (N,) bool prev cell activation
    num_cells: int,
    sampling_synapses: int,
    permanence_initial: float,
):
    """Grow synapses on learning segments toward previous winner cells.

    Per row: n_grow = clip(sampling - active_potential, 0,
    min(sampling, n_winners)) (`projections.py:115`), where
    active_potential counts live synapses targeting prev-active cells
    *after* this step's permanence update/destruction (`add_edge` reads
    the post-update table, `projections.py:111-114`). Candidates get
    i.i.d. U[0,1) priorities; already-connected targets are masked to
    +inf (`projections.py:120-121`); the n_grow smallest-priority
    finite candidates are written into free slots in ascending candidate
    order (`utils.py:44-76` fill order).

    Returns (synapse_cell, synapse_perm, grown_per_row, overflow).
    """
    K, S = synapse_cell.shape
    L = learn_idx.shape[0]
    W = winner_idx.shape[0]

    row_cell = jnp.take(synapse_cell, learn_idx, axis=1, mode="clip")  # (K, L)
    row_perm = jnp.take(synapse_perm, learn_idx, axis=1, mode="clip")
    act_syn = gather_or(prev_active, row_cell, False)
    row_potential = act_syn.sum(axis=0, dtype=jnp.int32)               # (L,)
    n_grow = jnp.clip(
        sampling_synapses - row_potential,
        0,
        jnp.minimum(sampling_synapses, n_winners),
    )

    # Random priorities; existing targets and padded winner slots -> +inf.
    pri = jax.random.uniform(key, (L, W), jnp.float32)
    cell_to_slot = (
        jnp.full((num_cells,), W, jnp.int32)
        .at[winner_idx]
        .set(jnp.arange(W, dtype=jnp.int32), mode="drop")
    )
    syn_slot = gather_or(cell_to_slot, row_cell, W)
    l_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (K, L))
    pri = pri.at[l_ids, syn_slot].set(jnp.inf, mode="drop")
    pri = jnp.where(winner_valid[None, :], pri, jnp.inf)

    # Rank by priority; select rank < n_grow among finite candidates
    # (mirrors the argsort/put_along_axis selection, projections.py:124-127).
    order = jnp.argsort(pri, axis=1)
    rank_of = (
        jnp.zeros((L, W), jnp.int32)
        .at[jnp.arange(L, dtype=jnp.int32)[:, None], order]
        .set(jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (L, W)))
    )
    chosen = (rank_of < n_grow[:, None]) & (pri < 1.0)

    src_vals = jnp.broadcast_to(winner_idx[None, :], (L, W))
    new_rows_cell, wrote, overflow = slot_fill(
        row_cell.T, row_cell.T < 0, src_vals, chosen
    )
    new_rows_perm = jnp.where(wrote, permanence_initial, row_perm.T)

    cols = jnp.where(learn_valid, learn_idx, S)
    synapse_cell = synapse_cell.at[:, cols].set(new_rows_cell.T, mode="drop")
    synapse_perm = synapse_perm.at[:, cols].set(new_rows_perm.T, mode="drop")
    grown = wrote.sum(axis=1) * learn_valid
    wrote_full = (
        jnp.zeros((K, S), jnp.bool_).at[:, cols].set(wrote.T, mode="drop")
    )
    return (synapse_cell, synapse_perm, grown,
            (overflow * learn_valid).sum(), wrote_full)
