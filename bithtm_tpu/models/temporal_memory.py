"""Functional TemporalMemory: one recurrent timestep as a pure function.

Re-implements the semantics of `TemporalMemory.process`
(`networks.py:91-128`) + `PredictiveProjection.process/update`
(`projections.py:245-293`) over a static padded synapse pool, in the
order the reference executes them:

  1. bursting from previous prediction            (`networks.py:96-97`)
  2. winner-cell selection (best-matching / least-used, jittered
     tie-breaks)                                   (`networks.py:100-104`)
  3. learning: permanence +/-, synapse death, punishment, segment
     allocation (recycle-before-grow), synapse growth toward previous
     winners                                       (`networks.py:106-113`)
  4. activation (predicted | bursting)             (`networks.py:115-119`)
  5. distal forward pass -> next prediction        (`networks.py:121-127`)

All masks are dense; compaction to static widths happens only where the
reference builds O(active) index lists (learning segments, winner cells,
new segments). Capacity overflows are dropped and surfaced as metrics
instead of reallocating (the reference grows arrays, `utils.py:113-135`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TMConfig
from ..ops.growth import allocate_segments, grow_synapses
from ..ops.masked import compact_mask, gather_or
from ..ops.segment import segment_forward
from ..state import TMState


class TMOutput(NamedTuple):
    """Per-step observables, mirroring `TemporalMemory.State`
    (`networks.py:39-46`) as dense masks plus bookkeeping metrics."""

    active_mask: jnp.ndarray      # (N,) bool
    winner_mask: jnp.ndarray      # (N,) bool
    prediction: jnp.ndarray       # (N,) bool (for the *next* step)
    prev_prediction: jnp.ndarray  # (N,) bool (this step's input prediction)
    bursting_columns: jnp.ndarray # (C,) bool
    metrics: dict


class TMDebug(NamedTuple):
    """Decision trace for oracle parity testing (see
    `bithtm_tpu/oracle`): every RNG-dependent choice the step made."""

    winner_mask: jnp.ndarray       # (N,) bool
    learning_segments: jnp.ndarray # (S,) bool (incl. newly allocated)
    punished_segments: jnp.ndarray # (S,) bool
    new_segment_slots: jnp.ndarray # (U,) int32 slot per unaccounted cell
    new_segment_cells: jnp.ndarray # (U,) int32 owner cell per new slot
    new_segment_valid: jnp.ndarray # (U,) bool
    grown_cell: jnp.ndarray        # (K, S) int32 synapse targets post-growth
    grown_mask: jnp.ndarray        # (K, S) bool which slots were grown


def _winner_selection(cfg: TMConfig, state: TMState, key: jax.Array,
                      active_col_mask: jnp.ndarray):
    """Steps 1-2: bursting + winner cells.

    Returns (bursting_col, winner_mask, cell_max_j, seg_j) where
    cell_max_j is the per-cell max jittered matching potential
    (`projections.py:229-239`) and seg_j the per-segment jittered
    potential, both reused by the learning phase (the reference draws
    this jitter once per state and shares it, `projections.py:241-243`).
    """
    C, D, N = cfg.column_dim, cfg.cell_dim, cfg.num_cells
    k_seg, k_least = jax.random.split(key)

    pred_cd = state.prediction.reshape(C, D)
    col_predicted = pred_cd.any(axis=1)
    bursting_col = active_col_mask & ~col_predicted      # networks.py:96-97

    # Best-matching: jittered max potential per cell over matching
    # segments (projections.py:229-243, networks.py:73-82).
    seg_j = jnp.where(
        state.segment_matching,
        state.segment_potential.astype(jnp.float32)
        + jax.random.uniform(k_seg, (cfg.segment_capacity,), jnp.float32),
        0.0,
    )
    cell_max_j = (
        jnp.zeros((N,), jnp.float32)
        .at[state.segment_owner]
        .max(seg_j, mode="drop")
    )
    cell_max_cd = cell_max_j.reshape(C, D)
    col_max = cell_max_cd.max(axis=1, keepdims=True)
    col_matching = col_max >= cfg.segment_matching_threshold
    cell_best_matching = jnp.abs(cell_max_cd - col_max) < cfg.epsilon

    # Least-used: jittered argmin of per-cell segment counts
    # (networks.py:84-89).
    cell_seg_count = (
        jnp.zeros((N,), jnp.int32)
        .at[state.segment_owner]
        .add(1, mode="drop")
    )
    csc_j = cell_seg_count.reshape(C, D).astype(jnp.float32) + \
        jax.random.uniform(k_least, (C, D), jnp.float32)
    cell_least_used = (
        jnp.abs(csc_j - csc_j.min(axis=1, keepdims=True)) < cfg.epsilon
    )

    # networks.py:102-104
    winner_cd = pred_cd | (
        bursting_col[:, None]
        & jnp.where(col_matching, cell_best_matching, cell_least_used)
    )
    winner_mask = (winner_cd & active_col_mask[:, None]).reshape(N)
    return bursting_col, winner_mask, cell_max_j, seg_j


def _learn(cfg: TMConfig, state: TMState, key: jax.Array,
           active_col_mask: jnp.ndarray, winner_mask: jnp.ndarray,
           cell_max_j: jnp.ndarray, seg_j: jnp.ndarray):
    """Step 3: all graph mutation (`PredictiveProjection.update`,
    `projections.py:257-293`). Learns against the *previous* step's
    activation/winners; a no-op on step 0 (prev distal state is None,
    `projections.py:258-259`)."""
    C, D, N = cfg.column_dim, cfg.cell_dim, cfg.num_cells
    K, S = cfg.synapse_capacity, cfg.segment_capacity
    has_prev = state.step > 0

    owner = state.segment_owner
    synapse_cell, synapse_perm = state.synapse_cell, state.synapse_perm
    prev_active, prev_winner = state.active_mask, state.winner_mask

    # --- learning / punished segment sets (projections.py:264-269) ---
    owner_winner = jnp.take(winner_mask, owner, mode="fill", fill_value=False)
    owner_pred = jnp.take(state.prediction, owner, mode="fill",
                          fill_value=False)
    owner_cell_max = jnp.take(cell_max_j, owner, mode="fill", fill_value=0.0)
    seg_best_matching = jnp.abs(seg_j - owner_cell_max) < cfg.epsilon
    learning_seg = (
        state.segment_matching
        & owner_winner
        & (state.segment_active | (~owner_pred & seg_best_matching))
        & has_prev
    )
    cell_punished = jnp.repeat(~active_col_mask, D)  # networks.py:107-111
    punished_seg = (
        state.segment_matching
        & jnp.take(cell_punished, owner, mode="fill", fill_value=False)
        & has_prev
    )

    # --- segment allocation for unaccounted winners ---
    # (projections.py:271-281): winner cells with no matching segment
    # (max jittered potential < eps) get one, recycle-before-grow.
    unaccounted = winner_mask & (cell_max_j < cfg.epsilon) & has_prev
    un_cells, un_valid = compact_mask(unaccounted, cfg.max_new_segments, N)
    syn_count = (synapse_cell >= 0).sum(axis=0, dtype=jnp.int32)
    slots, assign_valid = allocate_segments(
        owner, syn_count, un_cells, un_valid,
        cfg.segment_matching_threshold, N,
    )
    owner = owner.at[slots].set(un_cells, mode="drop")
    # Clear recycled slots (add_output resets rows, projections.py:82-85).
    synapse_cell = synapse_cell.at[:, slots].set(-1, mode="drop")
    synapse_perm = synapse_perm.at[:, slots].set(-1.0, mode="drop")
    learning_seg = learning_seg.at[slots].set(True, mode="drop")

    # --- permanence update + synapse death (projections.py:97-109) ---
    # Learning rows: active synapse +inc, inactive -dec; punished rows:
    # active synapse -punishment (projections.py:283-293). The two sets
    # are disjoint (winner cells are in active columns), so one fused
    # masked update is exact.
    act_syn = gather_or(prev_active, synapse_cell, False)
    live = synapse_cell >= 0
    delta = (
        learning_seg[None, :]
        * jnp.where(act_syn, cfg.permanence_increment,
                    -cfg.permanence_decrement)
        + punished_seg[None, :]
        * jnp.where(act_syn, -cfg.permanence_punishment, 0.0)
    )
    synapse_perm = synapse_perm + live * delta
    dead = live & (synapse_perm < 0.0)
    synapse_cell = jnp.where(dead, -1, synapse_cell)
    synapse_perm = jnp.where(dead, -1.0, synapse_perm)

    # --- synapse growth toward previous winners (projections.py:111-161) ---
    learn_idx, learn_valid = compact_mask(
        learning_seg, cfg.max_learning_segments, S
    )
    winner_idx, winner_valid = compact_mask(
        prev_winner, cfg.max_winner_cells, N
    )
    n_winners = prev_winner.sum(dtype=jnp.int32)
    synapse_cell, synapse_perm, grown, grow_overflow, grown_mask = grow_synapses(
        key, synapse_cell, synapse_perm,
        learn_idx, learn_valid, winner_idx, winner_valid, n_winners,
        prev_active, N, cfg.segment_sampling_synapses,
        cfg.permanence_initial,
    )

    metrics = {
        "tm_new_segments": assign_valid.sum(dtype=jnp.int32),
        "tm_grown_synapses": grown.sum(dtype=jnp.int32),
        "tm_learning_segments": learning_seg.sum(dtype=jnp.int32),
        "tm_punished_segments": punished_seg.sum(dtype=jnp.int32),
        # capacity-overflow counters (reference reallocates instead):
        "tm_dropped_new_segments": (unaccounted.sum(dtype=jnp.int32)
                                    - assign_valid.sum(dtype=jnp.int32)),
        "tm_dropped_learning_segments": (
            learning_seg.sum(dtype=jnp.int32)
            - learn_valid.sum(dtype=jnp.int32)
        ),
        "tm_dropped_synapses": grow_overflow,
    }
    debug = TMDebug(
        winner_mask=winner_mask,
        learning_segments=learning_seg,
        punished_segments=punished_seg,
        new_segment_slots=slots,
        new_segment_cells=un_cells,
        new_segment_valid=assign_valid,
        grown_cell=synapse_cell,
        grown_mask=grown_mask,
    )
    return synapse_cell, synapse_perm, owner, metrics, debug


def tm_step(
    cfg: TMConfig,
    state: TMState,
    key: jax.Array,
    active_col_mask: jnp.ndarray,
    learning: bool = True,
    compute_winner: bool = True,
    return_debug: bool = False,
) -> tuple[TMState, TMOutput]:
    """One TM timestep for a single stream.

    `learning`, `compute_winner`, `return_debug` are jit-static, mirroring
    the `learning` / `return_winner_cell` flags of `networks.py:91`.
    """
    C, D, N = cfg.column_dim, cfg.cell_dim, cfg.num_cells
    k_select, k_grow = jax.random.split(key)

    prev_prediction = state.prediction
    pred_cd = prev_prediction.reshape(C, D)

    debug = None
    if learning or compute_winner:
        bursting_col, winner_mask, cell_max_j, seg_j = _winner_selection(
            cfg, state, k_select, active_col_mask
        )
    else:
        col_predicted = pred_cd.any(axis=1)
        bursting_col = active_col_mask & ~col_predicted
        winner_mask = jnp.zeros((N,), jnp.bool_)

    if learning:
        synapse_cell, synapse_perm, owner, learn_metrics, debug = _learn(
            cfg, state, k_grow, active_col_mask, winner_mask,
            cell_max_j, seg_j,
        )
    else:
        synapse_cell, synapse_perm, owner = (
            state.synapse_cell, state.synapse_perm, state.segment_owner
        )
        learn_metrics = {}

    # --- activation: predicted cells + full bursting columns
    # (networks.py:115-119) ---
    activation_cd = (pred_cd | bursting_col[:, None]) & active_col_mask[:, None]
    active_mask = activation_cd.reshape(N)

    # --- distal forward pass -> next prediction (networks.py:121-122) ---
    potential, matching, seg_active, prediction = segment_forward(
        synapse_cell, synapse_perm, owner, active_mask, N,
        cfg.permanence_threshold, cfg.segment_activation_threshold,
        cfg.segment_matching_threshold,
    )

    new_state = TMState(
        synapse_cell=synapse_cell,
        synapse_perm=synapse_perm,
        segment_owner=owner,
        active_mask=active_mask,
        winner_mask=winner_mask,
        prediction=prediction,
        segment_potential=potential,
        segment_matching=matching,
        segment_active=seg_active,
        step=state.step + 1,
    )
    metrics = {
        "tm_bursting_columns": bursting_col.sum(dtype=jnp.int32),
        "tm_active_cells": active_mask.sum(dtype=jnp.int32),
        "tm_predicted_cells": prediction.sum(dtype=jnp.int32),
        "tm_matching_segments": matching.sum(dtype=jnp.int32),
        "tm_pool_occupancy": (owner < N).sum(dtype=jnp.int32),
        **learn_metrics,
    }
    out = TMOutput(
        active_mask=active_mask,
        winner_mask=winner_mask,
        prediction=prediction,
        prev_prediction=prev_prediction,
        bursting_columns=bursting_col,
        metrics=metrics,
    )
    if return_debug:
        return new_state, out, debug
    return new_state, out
