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
    """Convert a TMDebug pytree (numpy-convertible) into OracleDecisions.

    Slot ids are global (c * G + g, matching the oracle's flattening of
    the per-column pool); cells are global ids.
    """
    winner = set(np.nonzero(np.asarray(debug.winner_mask))[0].tolist())

    learning_cg = np.asarray(debug.learning_segments)      # (C, G)
    G = learning_cg.shape[1]
    learning = set(
        (int(c) * G + int(g))
        for c, g in zip(*np.nonzero(learning_cg))
    )

    new_cg = np.asarray(debug.new_segments)                # (C, G)
    seg_cell = np.asarray(debug.seg_cell)                  # (C, G)
    D = np.asarray(debug.winner_mask).shape[0] // new_cg.shape[0]
    new_segments = [
        (int(c) * G + int(g), int(c) * D + int(seg_cell[c, g]))
        for c, g in zip(*np.nonzero(new_cg))
    ]

    grown_mask = np.asarray(debug.grown_mask)              # (C, G, K)
    cell_tab = np.asarray(debug.synapse_cell)              # (C, G, K)
    grown = {}
    cs, gs, ks = np.nonzero(grown_mask)
    for c, g, k in zip(cs.tolist(), gs.tolist(), ks.tolist()):
        grown.setdefault(c * G + g, set()).add(int(cell_tab[c, g, k]))
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
    C, D, G = cfg.column_dim, cfg.cell_dim, cfg.segments_per_column
    seg_cell = np.asarray(tm_state.seg_cell)
    cell_tab = np.asarray(tm_state.synapse_cell).reshape(C, G, -1)
    perm_tab = np.asarray(tm_state.synapse_perm).reshape(C, G, -1)
    K = cell_tab.shape[-1]
    for s in range(cfg.segment_capacity):
        c, g = divmod(s, G)
        if seg_cell[c, g] < D:
            o.owner[s] = int(c * D + seg_cell[c, g])
            # dead iff perm < 0 (implicit punishment death leaves stale
            # target ids behind, see TMState docstring)
            o.synapses[s] = {
                int(cell_tab[c, g, k]): float(perm_tab[c, g, k])
                for k in range(K)
                if cell_tab[c, g, k] >= 0 and perm_tab[c, g, k] >= 0
            }

    from .bami import bits_to_cell_set

    o.active_cells = bits_to_cell_set(
        tm_state.active_cols, tm_state.active_bits, D
    )
    o.winner_cells = bits_to_cell_set(
        tm_state.active_cols, tm_state.winner_bits, D
    )
    from ..ops.active_set import prediction_dense_host

    o.predicted_cells = set(
        np.nonzero(
            prediction_dense_host(tm_state.prediction, D).reshape(-1)
        )[0].tolist()
    )
    # per-segment forward state re-derived from the cached activity +
    # permanences (the step no longer carries (C, G) flag arrays; the
    # carried matching_word packs the matching bits — audited against
    # this same derivation by `utils.checks`)
    act = (np.asarray(tm_state.synapse_act) != 0).reshape(C, G, K)
    pot = act.sum(-1)                                      # (C, G)
    conn = (act & (perm_tab >= cfg.permanence_threshold)).sum(-1)
    matching = pot >= cfg.segment_matching_threshold
    seg_active = matching & (conn >= cfg.segment_activation_threshold)
    o.potential = pot.reshape(-1).tolist()
    o.matching = set(np.nonzero(matching.reshape(-1))[0].tolist())
    o.active_segments = set(np.nonzero(seg_active.reshape(-1))[0].tolist())
    o.step_count = int(np.asarray(tm_state.step))
    return o
