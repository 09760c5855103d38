"""State-invariant validation — the functional-world "sanitizer".

The reference has no sanitizers (single-threaded NumPy). Under XLA the
failure modes are different: index corruption from a bad masked write,
inconsistent dual state, NaN permanences (SURVEY.md §5 maps race
detection to exactly this). `validate_state` re-derives every structural
invariant of a TMState on the host and raises with a precise message;
call it in tests or between training epochs (it is NOT jittable on
purpose — it is the out-of-band auditor).
"""

from __future__ import annotations

import numpy as np


class StateInvariantError(AssertionError):
    pass


def validate_tm_state(cfg, tm) -> None:
    """Check every structural invariant of a (host) TMState."""
    C, D, G, K = (cfg.column_dim, cfg.cell_dim, cfg.segments_per_column,
                  cfg.synapse_capacity)
    N = C * D
    syn = np.asarray(tm.synapse_cell).reshape(C, G, K)
    perm = np.asarray(tm.synapse_perm).reshape(C, G, K)
    seg_cell = np.asarray(tm.seg_cell)

    def fail(msg):
        raise StateInvariantError(msg)

    if not ((seg_cell >= 0) & (seg_cell <= D)).all():
        fail("seg_cell out of [0, D] range")
    # a slot is live iff perm >= 0; slots with syn >= 0 but perm < 0 are
    # stale punishment-death victims awaiting row-space cleanup (the
    # implicit-death convention, see TMState docstring). Stale ids were
    # once valid targets, so the range check covers them too.
    live = (syn >= 0) & (perm >= 0.0)
    if not (syn[syn >= 0] < N).all():
        fail("synapse target cell out of range")
    if np.isnan(perm).any():
        fail("NaN permanence")
    if not (syn[perm >= 0.0] >= 0).all():
        fail("live permanence on a free (syn == -1) slot")
    if not (perm[syn < 0] == -1.0).all():
        fail("free slot with non-sentinel permanence")
    # synapses may only live on allocated segments
    unalloc = seg_cell == D
    if live[unalloc].any():
        fail("live synapse on unallocated segment slot")
    # no duplicate targets within a segment
    for c, g in zip(*np.nonzero(live.any(-1))):
        targets = syn[c, g][live[c, g]]
        if len(np.unique(targets)) != len(targets):
            fail(f"duplicate synapse targets in segment ({c},{g})")
    # compact active set: column ids in range, sorted
    cols = np.asarray(tm.active_cols)
    if not ((cols >= 0) & (cols < C)).all():
        fail("active_cols out of range")
    if not (np.diff(cols) >= 0).all():
        fail("active_cols not sorted")
    # cached forward activity must equal the post-step table's
    # activation wrt the carried compact active set — an exact per-entry
    # re-derivation of the packed value v = act + scale*conn
    # (`ops.active_set.act_scale`; 0, 1 and 1+scale are all bf16-exact)
    bits = np.asarray(tm.active_bits)                  # (A, W)
    d = np.arange(D)
    rows = (bits[:, d // 32] >> (d % 32)) & 1          # (A, D)
    dense = np.zeros((C, D), bool)
    dense[cols] = rows != 0
    active_cell = dense.reshape(-1)                    # (N,)
    from ..ops.active_set import act_scale

    scale = act_scale(K)
    v = np.asarray(tm.synapse_act, np.float32).reshape(C, G, K)
    expect_act = live & active_cell[np.clip(syn, 0, N - 1)]
    expect_conn = expect_act & (perm >= cfg.permanence_threshold)
    expect_v = np.where(
        expect_act, np.where(expect_conn, 1.0 + scale, 1.0), 0.0
    ).astype(np.float32)
    if not (v == expect_v).all():
        fail("synapse_act inconsistent with the table + active set")
    act = v != 0
    # the carried matching_word must equal the flags derived from that
    # activity (the same derivation the step uses at its active rows)
    from ..ops.active_set import matching_dense_host, prediction_dense_host

    pot = act.sum(-1)
    match = matching_dense_host(tm.matching_word, G)
    if not (match == (pot >= cfg.segment_matching_threshold)).all():
        fail("matching_word inconsistent with cached synapse_act")
    # the carried packed prediction must equal the forward pass
    # re-derived from the table + cached activity: a segment predicts
    # its owner cell iff it is matching AND has >= activation_threshold
    # connected (perm >= theta) active synapses
    conn_cnt = (act & (perm >= cfg.permanence_threshold)).sum(-1)  # (C, G)
    seg_active = (
        (pot >= cfg.segment_matching_threshold)
        & (conn_cnt >= cfg.segment_activation_threshold)
    )
    pred_cell = np.zeros((C, D), bool)
    for c, g in zip(*np.nonzero(seg_active)):
        if seg_cell[c, g] < D:
            pred_cell[c, seg_cell[c, g]] = True
    got_pred = prediction_dense_host(tm.prediction, D)  # (C, D)
    if not (got_pred == pred_cell).all():
        fail("packed prediction inconsistent with table + synapse_act")


def validate_state(cfg, state) -> None:
    """Validate a full HTMState (host pytree) — SP + TM invariants."""
    validate_tm_state(cfg.tm, state.tm)
    perm = np.asarray(state.sp.permanence)
    conn = np.asarray(state.sp.connected)
    if perm.dtype.kind == "f" and np.isnan(perm).any():
        raise StateInvariantError("NaN SP permanence")
    thr = (cfg.sp.to_units(cfg.sp.permanence_threshold)
           if cfg.sp.quantized else cfg.sp.permanence_threshold)
    expect = perm >= thr
    # unpack the (..., S) uint8 bitmask cache to (..., I) bool with the
    # pack's own (strided) bit mapping
    from ..ops.overlap import unpack_connected

    got = np.asarray(unpack_connected(conn, perm.shape[-1]))
    if not (got == expect).all():
        raise StateInvariantError("SP connected cache inconsistent")
    duty = np.asarray(state.sp.duty_cycle)
    if not ((duty >= 0.0) & (duty <= 1.0)).all():
        raise StateInvariantError("SP duty cycle out of [0, 1]")


def assert_trees_bit_equal(got, want, got_metrics=None, want_metrics=None):
    """Assert two state pytrees are **bit-equal**, leaf by leaf.

    The one shared comparator behind every sharded-vs-unsharded
    equality check (`__graft_entry__.dryrun_multichip`,
    `scripts/model_parallel_16k_check.py`, `tests/test_parallel.py`):
    flattens both trees, asserts identical treedefs, unwraps typed
    PRNG-key leaves via `jax.random.key_data`, and compares every leaf
    with exact array equality. Optionally also compares two metric
    dicts key-by-key.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(got)
    want_leaves, want_treedef = jax.tree_util.tree_flatten(want)
    if treedef != want_treedef:
        raise StateInvariantError(
            f"tree structures differ: {treedef} vs {want_treedef}"
        )
    paths = jax.tree_util.tree_flatten_with_path(got)[0]
    for (path, _), lhs, rhs in zip(paths, leaves, want_leaves):
        if hasattr(lhs, "dtype") and jnp.issubdtype(
            lhs.dtype, jax.dtypes.prng_key
        ):
            lhs, rhs = jax.random.key_data(lhs), jax.random.key_data(rhs)
        np.testing.assert_array_equal(
            np.asarray(lhs), np.asarray(rhs),
            err_msg=f"leaf {jax.tree_util.keystr(path)}",
        )
    if got_metrics is not None:
        for k in want_metrics:
            np.testing.assert_array_equal(
                np.asarray(got_metrics[k]), np.asarray(want_metrics[k]),
                err_msg=f"metric {k}",
            )
