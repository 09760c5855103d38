"""Compact serving tables (`ops/serving.py`): pack correctness against
a naive NumPy count, end-to-end bit-equality of the packed serve scan
vs the unpacked inference scan, and the contract guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bithtm_tpu import htm_init_batch, htm_scan, htm_serve_scan, make_htm_config
from bithtm_tpu.ops.serving import (
    make_serving_table,
    pack_serving_rows,
    serving_counts,
)


def _naive_counts(syn, perm, thr, K, cols_active_cells):
    """count[c, g] = connected synapses of (c, g) with active target."""
    C, J = syn.shape
    G = J // K
    out = np.zeros((C, G), np.int32)
    for c in range(C):
        for j in range(J):
            s = int(syn[c, j])
            if s >= 0 and perm[c, j] >= thr and s in cols_active_cells:
                out[c, j // K] += 1
    return out


def _active_encoding(rng, C, D, A):
    cols = np.sort(rng.choice(C, A, replace=False)).astype(np.int32)
    rows = rng.rand(A, D) < 0.4
    from bithtm_tpu.ops.active_set import pack_bits

    bits = pack_bits(jnp.asarray(rows))
    cells = {
        int(cols[a]) * D + d for a in range(A) for d in range(D)
        if rows[a, d]
    }
    return jnp.asarray(cols), bits, cells


def test_pack_and_counts_match_naive_with_ext_rows():
    """Random tables plus crafted dense columns that spill into the
    extension region (one column needs TWO extension rows)."""
    rng = np.random.RandomState(3)
    C, D, G, K, A = 256, 16, 4, 64, 9
    J, N = G * K, C * D
    syn = rng.randint(-1, N, size=(C, J)).astype(np.int32)
    # sparse connectivity (~1/6 of slots) so the crafted dense columns
    # sit far past the p99 width-selection quantile
    perm = (rng.rand(C, J) * 1.2 - 0.5).astype(np.float32)
    # column 5: everything connected (256 conn -> width 128 + 1 ext
    # chunk of 128); column 17: 200 connected (one partial ext chunk)
    syn[5] = rng.randint(0, N, size=J)
    perm[5] = 0.9
    syn[17] = rng.randint(0, N, size=J)
    perm[17] = 0.9
    perm[17, 200:] = -1.0
    # column 30: dead everywhere (stale ids with perm < 0)
    perm[30] = -1.0

    class TM:
        synapse_cell = jnp.asarray(syn)
        synapse_perm = jnp.asarray(perm)

    cfg = make_htm_config(
        input_dim=32, column_dim=C, cell_dim=D, active_columns=A,
        segments_per_column=G, synapse_capacity=K,
    ).tm
    tab = make_serving_table(cfg, TM)
    E = tab.ext_col.shape[0]
    M = (tab.rows.shape[0] - E) // C
    assert E >= 2, (E, M)  # the dense columns must have spilled

    for seed in range(3):
        r2 = np.random.RandomState(100 + seed)
        cols, bits, cells = _active_encoding(r2, C, D, A)
        got = np.asarray(serving_counts(tab, cols, bits, C, D, G))
        want = _naive_counts(syn, perm, cfg.permanence_threshold, K, cells)
        np.testing.assert_array_equal(got, want)


def test_serve_scan_packed_bit_equals_unpacked():
    """htm_serve_scan(serving_table=...) returns metrics and a
    prediction carry bit-identical to the unpacked serve scan on a
    trained state (synapse_act / matching_word are exempt: documented
    stale pass-throughs)."""
    cfg = make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )
    B, T = 3, 40
    rng = np.random.RandomState(0)
    pats = rng.rand(5, B, 64) < 0.2
    seq = jnp.asarray(pats[np.arange(T) % 5])
    state = htm_init_batch(jax.random.key(0), cfg, B)
    state, _ = htm_scan(cfg, state, seq, True, 1)

    serve_seq = jnp.asarray(pats[np.arange(16) % 5])
    ref_state, ref_m = htm_serve_scan(
        jax.tree.map(lambda x: x, cfg), jax.tree.map(jnp.copy, state),
        serve_seq, 1, detailed_metrics=False)

    tab = make_serving_table(cfg.tm, state.tm)
    got_state, got_m = htm_serve_scan(
        cfg, jax.tree.map(jnp.copy, state), serve_seq, 1,
        detailed_metrics=False, serving_table=tab)

    assert set(ref_m) == set(got_m)
    for k in ref_m:
        np.testing.assert_array_equal(
            np.asarray(ref_m[k]), np.asarray(got_m[k]), err_msg=k)
    np.testing.assert_array_equal(np.asarray(ref_state.tm.prediction),
                                  np.asarray(got_state.tm.prediction))
    # frozen tables untouched
    np.testing.assert_array_equal(np.asarray(ref_state.tm.synapse_perm),
                                  np.asarray(got_state.tm.synapse_perm))


def test_serve_scan_table_works_under_defaults():
    """The flagship path must not error under its own defaults:
    `htm_serve_scan(..., serving_table=t)` with no other flags
    (detailed_metrics auto-resolves to False when a table is passed)."""
    cfg = make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )
    B, T = 2, 12
    rng = np.random.RandomState(2)
    pats = rng.rand(4, B, 64) < 0.2
    state = htm_init_batch(jax.random.key(0), cfg, B)
    state, _ = htm_scan(cfg, state, jnp.asarray(pats[np.arange(T) % 4]),
                        True, 1)
    tab = make_serving_table(cfg.tm, state.tm)
    _, m = htm_serve_scan(cfg, state, jnp.asarray(pats[np.arange(6) % 4]),
                          serving_table=tab)
    assert "bursting" in m
    assert "tm_pool_occupancy" not in m  # detailed metrics auto-off


def test_serve_resume_learn_matches_unserved():
    """serve(packed) -> resume_learning -> learn == serve(unpacked) ->
    learn, bit-equal on EVERY state leaf (the resume helper re-derives
    the stale synapse_act / matching_word carries)."""
    from bithtm_tpu import resume_learning

    cfg = make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )
    B = 3
    rng = np.random.RandomState(7)
    pats = rng.rand(5, B, 64) < 0.2
    train_seq = jnp.asarray(pats[np.arange(40) % 5])
    serve_seq = jnp.asarray(pats[np.arange(11) % 5])
    learn_seq = jnp.asarray(pats[np.arange(9) % 5])

    state = htm_init_batch(jax.random.key(0), cfg, B)
    state, _ = htm_scan(cfg, state, train_seq, True, 1)

    # control: unpacked inference then learning (never served packed)
    ref, _ = htm_serve_scan(cfg, jax.tree.map(jnp.copy, state), serve_seq,
                            1, detailed_metrics=False)
    ref, ref_m = htm_scan(cfg, ref, learn_seq, True, 1)

    tab = make_serving_table(cfg.tm, state.tm)
    got, _ = htm_serve_scan(cfg, jax.tree.map(jnp.copy, state), serve_seq,
                            1, serving_table=tab)
    got = resume_learning(cfg, got)
    got, got_m = htm_scan(cfg, got, learn_seq, True, 1)

    got_leaves = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, a in jax.tree_util.tree_leaves_with_path(ref):
        b = got_leaves[path]
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
    for k in ref_m:
        np.testing.assert_array_equal(np.asarray(ref_m[k]),
                                      np.asarray(got_m[k]), err_msg=k)


def test_resume_learning_noop_on_unserved_state():
    """On a state produced by the unpacked path, resume_learning is a
    bit-exact recompute of the carries it already holds."""
    from bithtm_tpu import resume_learning

    cfg = make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )
    rng = np.random.RandomState(9)
    pats = rng.rand(4, 2, 64) < 0.2
    state = htm_init_batch(jax.random.key(3), cfg, 2)
    state, _ = htm_scan(cfg, state, jnp.asarray(pats[np.arange(20) % 4]),
                        True, 1)
    resumed = resume_learning(cfg, jax.tree.map(jnp.copy, state))
    np.testing.assert_array_equal(np.asarray(state.tm.synapse_act),
                                  np.asarray(resumed.tm.synapse_act))
    np.testing.assert_array_equal(np.asarray(state.tm.matching_word),
                                  np.asarray(resumed.tm.matching_word))


def test_serving_table_contract_guards():
    cfg = make_htm_config(
        input_dim=32, column_dim=32, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=4,
    )
    state = htm_init_batch(jax.random.key(1), cfg, 2)
    tab = make_serving_table(cfg.tm, state.tm)
    x = jnp.zeros((2, 32), jnp.bool_)
    from bithtm_tpu.models.htm import htm_step_batch

    with pytest.raises(ValueError, match="serving-only"):
        htm_step_batch(cfg, state, x, learning=True, serving_table=tab)
    with pytest.raises(ValueError, match="serving-only"):
        htm_step_batch(cfg, state, x, learning=False, compute_winner=True,
                       serving_table=tab)
    with pytest.raises(ValueError, match="detailed_metrics"):
        htm_step_batch(cfg, state, x, learning=False,
                       compute_winner=False, detailed_metrics=True,
                       serving_table=tab)

    import dataclasses

    bad = dataclasses.replace(cfg.tm, segment_matching_threshold=3)
    with pytest.raises(ValueError, match="matching"):
        make_serving_table(bad, state.tm)


def test_pack_width_selection_minimal():
    """An empty state packs to the minimum one-row width, no ext."""
    cfg = make_htm_config(input_dim=32, column_dim=40, cell_dim=4,
                          active_columns=4).tm
    state_tm = type("TM", (), dict(
        synapse_cell=jnp.full((40, cfg.segments_per_column
                               * cfg.synapse_capacity), -1, jnp.int32),
        synapse_perm=jnp.full((40, cfg.segments_per_column
                               * cfg.synapse_capacity), -1.0),
    ))
    tab = make_serving_table(cfg, state_tm)
    assert tab.rows.shape == (40, 128)
    assert tab.ext_col.shape == (0,)
