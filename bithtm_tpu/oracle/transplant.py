"""Bridge between the JAX TM step and the NumPy oracle.

The reference transplants state *from* its vectorized TM *into* the
oracle (`reference_implementations.py:48-88`) and once tried to
pre-draw shared RNG (`:259-316`, abandoned). Here the bridge extracts
the JAX step's RNG-dependent **decisions** (TMDebug) so the oracle can
adopt-and-validate them — the direction that makes bit-exact parity
achievable.
"""

from __future__ import annotations

import numpy as np

from .bami import OracleDecisions, OracleTM


def extract_decisions(debug) -> OracleDecisions:
    """Convert a TMDebug pytree (numpy-convertible) into OracleDecisions."""
    winner = set(np.nonzero(np.asarray(debug.winner_mask))[0].tolist())
    learning = set(np.nonzero(np.asarray(debug.learning_segments))[0].tolist())

    slots = np.asarray(debug.new_segment_slots)
    cells = np.asarray(debug.new_segment_cells)
    valid = np.asarray(debug.new_segment_valid)
    new_segments = [
        (int(s), int(c)) for s, c, v in zip(slots, cells, valid) if v
    ]

    grown_mask = np.asarray(debug.grown_mask)
    grown_cell = np.asarray(debug.grown_cell)
    grown = {}
    ks, ss = np.nonzero(grown_mask)
    for k, s in zip(ks.tolist(), ss.tolist()):
        grown.setdefault(s, set()).add(int(grown_cell[k, s]))
    return OracleDecisions(
        winner_cells=winner,
        learning_segments=learning,
        new_segments=new_segments,
        grown=grown,
    )


def oracle_from_state(cfg, tm_state) -> OracleTM:
    """Build an oracle mid-stream from a JAX TMState (the analogue of
    `copy_custom`, `reference_implementations.py:48-88`)."""
    o = OracleTM(cfg)
    owner = np.asarray(tm_state.segment_owner)
    cell_tab = np.asarray(tm_state.synapse_cell)
    perm_tab = np.asarray(tm_state.synapse_perm)
    for s in range(cfg.segment_capacity):
        if owner[s] < cfg.num_cells:
            o.owner[s] = int(owner[s])
            o.synapses[s] = {
                int(cell_tab[k, s]): float(perm_tab[k, s])
                for k in range(cfg.synapse_capacity)
                if cell_tab[k, s] >= 0
            }
    o.active_cells = set(np.nonzero(np.asarray(tm_state.active_mask))[0].tolist())
    o.winner_cells = set(np.nonzero(np.asarray(tm_state.winner_mask))[0].tolist())
    o.predicted_cells = set(np.nonzero(np.asarray(tm_state.prediction))[0].tolist())
    o.potential = np.asarray(tm_state.segment_potential).tolist()
    o.matching = set(np.nonzero(np.asarray(tm_state.segment_matching))[0].tolist())
    o.active_segments = set(
        np.nonzero(np.asarray(tm_state.segment_active))[0].tolist()
    )
    o.step_count = int(np.asarray(tm_state.step))
    return o
