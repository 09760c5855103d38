"""Host-side component substitution (`host_hooks.HostTemporalMemory`).

The reference's composition root accepts an arbitrary Python object in
its TM slot and its example swaps in a pure-Python implementation
(`/root/reference/example.py:7-12` via `networks.py:134,144`). These
tests exercise the rebuild's equivalent: a stateful NumPy TM routed
through an ordered `io_callback` inside the jitted `htm_step`, with the
SP and driver metrics staying on the compiled path.
"""

import numpy as np

from bithtm_tpu import HierarchicalTemporalMemory, HostTemporalMemory


class RepeatPredictorTM:
    """Deterministic, stateless-rule NumPy TM for golden checks.

    Activates every cell of each active column, marks cell 0 as the
    winner, and predicts an exact repeat of the current activity. All
    state (the previous prediction) lives in the adapter, so every
    adapter behavior is observable from the call log alone.
    """

    def __init__(self, column_dim, cell_dim):
        self.C, self.D = column_dim, cell_dim
        self.calls = []

    def __call__(self, active_columns, learning):
        self.calls.append((np.array(active_columns), bool(learning)))
        active = np.zeros((self.C, self.D), bool)
        active[active_columns] = True
        winner = np.zeros((self.C, self.D), bool)
        winner[active_columns, 0] = True
        return active.reshape(-1), winner.reshape(-1), active.reshape(-1)


def test_host_tm_substitution_golden():
    C, D, A = 96, 4, 5
    host_tm = RepeatPredictorTM(C, D)
    htm = HierarchicalTemporalMemory(
        128, C, D, active_columns=A, seed=3,
        temporal_memory=HostTemporalMemory(host_tm),
    )

    rng = np.random.RandomState(0)
    x = rng.rand(128) < 0.3
    y = rng.rand(128) < 0.3

    prev_cols = None
    prev_pred = np.zeros((C * D,), bool)
    for t, inp in enumerate([x, x, x, y, x]):
        sp_out, tm_out = htm.process(inp, learning=True)
        cols = np.sort(np.asarray(sp_out.active_columns))

        # The host fn saw exactly the SP's active-column list, in order.
        assert len(host_tm.calls) == t + 1
        called_cols, called_learning = host_tm.calls[t]
        assert np.array_equal(np.sort(called_cols), cols)
        assert called_learning is True

        # The TM outputs are the host fn's returns, verbatim.
        active = np.zeros((C, D), bool)
        active[cols] = True
        winner = np.zeros((C, D), bool)
        winner[cols, 0] = True
        assert np.array_equal(np.asarray(tm_out.active_mask),
                              active.reshape(-1))
        assert np.array_equal(np.asarray(tm_out.winner_mask),
                              winner.reshape(-1))
        assert np.array_equal(np.asarray(tm_out.prediction),
                              active.reshape(-1))

        # The adapter supplies the wrapper contract: the previous
        # prediction is carried host-side and bursting columns are the
        # active columns with no previously-predicted cell.
        assert np.array_equal(np.asarray(tm_out.prev_prediction), prev_pred)
        prev_pred_cols = (
            set() if prev_cols is None else set(prev_cols.tolist())
        )
        expect_burst = np.zeros((C,), bool)
        for c in cols:
            expect_burst[c] = c not in prev_pred_cols
        assert np.array_equal(np.asarray(tm_out.bursting_columns),
                              expect_burst)

        # Driver metrics compose with the substituted TM
        # (correct/incorrect from prev_col_prediction, example.py:50-57).
        m = htm.last_metrics
        assert m["bursting"] == expect_burst.sum()
        expect_correct = len(prev_pred_cols & set(cols.tolist()))
        assert m["correct"] == expect_correct
        assert m["incorrect"] == len(prev_pred_cols) - expect_correct
        assert m["tm_active_cells"] == A * D
        assert m["tm_winner_cells"] == A

        prev_cols = cols
        prev_pred = active.reshape(-1)


def test_host_tm_reset_clears_carried_prediction():
    C, D, A = 64, 2, 4
    adapter = HostTemporalMemory(RepeatPredictorTM(C, D))
    htm = HierarchicalTemporalMemory(64, C, D, active_columns=A, seed=0,
                                     temporal_memory=adapter)
    x = np.random.RandomState(1).rand(64) < 0.3

    htm.process(x)
    _, tm_out = htm.process(x)
    # Second identical step: the repeat predictor covered every column.
    assert htm.last_metrics["bursting"] == 0

    adapter.reset()
    _, tm_out = htm.process(x)
    # The carried prediction is gone: every active column bursts again.
    assert htm.last_metrics["bursting"] == A
    assert not np.asarray(tm_out.prev_prediction).any()
