"""Encoder contracts: fixed sparsity, locality of overlap, batching, and
an end-to-end NAB-style anomaly pipeline on a synthetic periodic signal."""

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu import htm_init, htm_scan, make_htm_config
from bithtm_tpu.encoders import (
    CategoryEncoder,
    CyclicEncoder,
    DateTimeEncoder,
    ScalarEncoder,
    anomaly_score,
    concat,
)


def test_scalar_encoder_sparsity_and_locality():
    enc = ScalarEncoder(0.0, 100.0, size=200, active_bits=15)
    a = np.asarray(enc(10.0))
    b = np.asarray(enc(11.0))
    c = np.asarray(enc(90.0))
    assert a.sum() == b.sum() == c.sum() == 15
    assert (a & b).sum() > 10        # near values share most bits
    assert (a & c).sum() == 0        # far values share none
    # clipping
    assert np.array_equal(np.asarray(enc(-5.0)), np.asarray(enc(0.0)))
    assert np.array_equal(np.asarray(enc(500.0)), np.asarray(enc(100.0)))


def test_scalar_encoder_batched():
    enc = ScalarEncoder(0.0, 1.0, size=64, active_bits=5)
    out = np.asarray(enc(jnp.asarray([[0.0, 0.5], [1.0, 0.25]])))
    assert out.shape == (2, 2, 64)
    assert (out.sum(-1) == 5).all()


def test_cyclic_encoder_wraps():
    enc = CyclicEncoder(24.0, size=48, active_bits=5)
    late = np.asarray(enc(23.9))
    early = np.asarray(enc(0.1))
    assert late.sum() == early.sum() == 5
    assert (late & early).sum() >= 3   # adjacent across the wrap


def test_category_encoder_disjoint():
    enc = CategoryEncoder(4, active_bits=6)
    outs = [np.asarray(enc(i)) for i in range(4)]
    for i in range(4):
        assert outs[i].sum() == 6
        for j in range(i + 1, 4):
            assert (outs[i] & outs[j]).sum() == 0


def test_datetime_encoder_shape():
    enc = DateTimeEncoder()
    out = np.asarray(enc(jnp.asarray([0.0, 3600.0 * 5])))
    assert out.shape == (2, enc.size)
    assert (out.sum(-1) == enc.hour_bits + enc.weekday_bits).all()


def test_anomaly_score():
    act = np.zeros(10, bool); act[:4] = True
    pred = np.zeros(10, bool); pred[:2] = True
    assert anomaly_score(pred, act) == 0.5
    assert anomaly_score(act, act) == 0.0
    assert anomaly_score(np.zeros(10, bool), act) == 1.0


def test_nab_style_anomaly_pipeline():
    """A periodic scalar stream: anomaly falls as the model learns the
    cycle, then spikes when the signal breaks pattern."""
    value_enc = ScalarEncoder(-1.2, 1.2, size=160, active_bits=13)
    time_enc = CyclicEncoder(8.0, size=64, active_bits=7)
    cfg = make_htm_config(
        input_dim=value_enc.size + time_enc.size,
        column_dim=128, cell_dim=8, active_columns=6,
        segment_activation_threshold=3, segment_matching_threshold=3,
        segment_sampling_synapses=12,
        # default boosting (0.3) keeps remapping columns on short runs
        sp_overrides={"boosting_intensity": 0.05},
    )
    t = np.arange(8 * 30)
    values = np.sin(2 * np.pi * t / 8.0)
    x = np.asarray(concat(value_enc(jnp.asarray(values)),
                          time_enc(jnp.asarray(t, dtype=jnp.float32))))
    state = htm_init(jax.random.key(0), cfg)
    state, metrics = htm_scan(cfg, state, jnp.asarray(x), True)
    anomaly = np.asarray(metrics["anomaly"])
    assert anomaly[:8].mean() > 0.9          # everything novel at first
    assert anomaly[-16:].mean() < 0.3        # cycle learned

    # break the pattern: constant outlier values
    x2 = np.asarray(concat(
        value_enc(jnp.full((8,), 1.2)),
        time_enc(jnp.asarray(np.arange(8), dtype=jnp.float32)),
    ))
    state, m2 = htm_scan(cfg, state, jnp.asarray(x2), True)
    assert np.asarray(m2["anomaly"])[1:].mean() > 0.5


def test_datetime_encoder_minute_resolution_current_era():
    # float32 phase reduction would quantize current-era epochs to its
    # 128s ulp; with minute-wide buckets a one-minute step must move
    # the encoding, including for float (f64) inputs
    enc = DateTimeEncoder(hour_size=1440, hour_bits=21)  # 60s buckets
    base = 1_755_000_000
    a = np.asarray(enc(base))
    b = np.asarray(enc(base + 60))         # one minute later
    c = np.asarray(enc(float(base + 60)))  # same, as a float timestamp
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(b, c)
    # 32-bit-overflow era (year 2040) still works
    _ = np.asarray(enc(2_220_000_000))


def test_anomaly_likelihood_flags_regime_change():
    """Jittable NAB-style post-processing: steady noisy scores keep the
    likelihood moderate; a sustained jump drives it into the alert
    tail. Runs under lax.scan like a serving loop."""
    import jax

    from bithtm_tpu import (anomaly_likelihood_init,
                            anomaly_likelihood_update)

    rng = np.random.RandomState(0)
    steady = rng.uniform(0.0, 0.2, 300).astype(np.float32)
    burst = rng.uniform(0.8, 1.0, 30).astype(np.float32)
    seq = jnp.asarray(np.concatenate([steady, burst]))

    @jax.jit
    def run(state, seq):
        return jax.lax.scan(anomaly_likelihood_update, state, seq)

    state, liks = run(anomaly_likelihood_init(window=200), seq)
    liks = np.asarray(liks)
    assert (liks[:19] == 0.5).all()          # undecided warm-up
    assert liks[150:300].max() < 0.999       # steady regime: no alert
    # burst onset alerts hard; the estimator then adapts as the burst
    # scores enter its own window (alert is a peak, not a plateau)
    assert liks[300:320].max() > 0.99999
    # recovers statefully: feeding steady scores again decays it
    state2, liks2 = run(state, jnp.asarray(steady[:150]))
    assert np.asarray(liks2)[-1] < 0.999


def test_alert_episodes_and_window_scoring():
    """Last mile of the NAB protocol: detections merge into alerts by
    gap, alerts score against ground-truth windows at the window level."""
    from bithtm_tpu import alert_episodes, score_alert_windows

    # gap 3: [5,6,8] merge; 20->23 merges (gap exactly 3); 40 stands alone
    eps = alert_episodes([5, 6, 8, 20, 23, 40], merge_gap=3)
    assert eps == [(5, 8), (20, 23), (40, 40)]
    assert alert_episodes([], merge_gap=3) == []

    windows = [(0, 10), (30, 35)]
    r = score_alert_windows(eps, windows)
    # (5,8) hits window 1; (20,23) and (40,40) hit nothing; window 2 missed
    assert (r["tp"], r["fp"], r["fn"]) == (1, 2, 1)
    assert r["precision"] == 1 / 3 and r["recall"] == 0.5
    assert abs(r["f1"] - 0.4) < 1e-12

    # perfect detection: one alert per window, no strays
    r2 = score_alert_windows([(2, 4), (31, 31)], windows)
    assert (r2["tp"], r2["fp"], r2["fn"]) == (2, 0, 0)
    assert r2["f1"] == 1.0

    # no alerts at all: recall 0, f1 0 (no division blowup)
    r3 = score_alert_windows([], windows)
    assert (r3["tp"], r3["fp"], r3["fn"]) == (0, 0, 2)
    assert r3["f1"] == 0.0


def test_seasonal_zscore_spike_no_echo_and_drift_immune():
    """The windowed z-score residual stage (round-4 failure-mode
    mitigation): fires on a point spike buried in noise, does NOT fire
    one period later (the median-of-lags baseline kills the seasonal
    echo), and is immune to slow linear drift."""
    from bithtm_tpu import seasonal_zscore

    P, T = 24, 1200
    t = np.arange(T)
    rng = np.random.RandomState(0)
    v = np.sin(2 * np.pi * t / P) + rng.normal(0, 0.12, T) \
        + np.linspace(0, 0.6, T)  # noise + drift, like the bench tasks
    at = 40 * P + P // 2
    v[at] = 1.9
    z = np.asarray(seasonal_zscore(jnp.asarray(v), P, window=4 * P))
    assert abs(z[at]) >= 5.0, z[at]
    # no seasonal echo: the next two same-phase steps stay quiet
    assert abs(z[at + P]) < 5.0 and abs(z[at + 2 * P]) < 5.0
    # drift + noise alone never cross the alert threshold
    rest = np.abs(np.delete(z, at))
    assert rest.max() < 5.0, rest.max()


def test_seasonal_zscore_streaming_matches_array_and_gates():
    from bithtm_tpu import (seasonal_zscore, seasonal_zscore_init,
                            seasonal_zscore_update)

    P, W, T = 12, 36, 300
    rng = np.random.RandomState(3)
    v = np.sin(2 * np.pi * np.arange(T) / P) + rng.normal(0, 0.1, T)
    z_arr = np.asarray(seasonal_zscore(jnp.asarray(v), P, window=W))
    st = seasonal_zscore_init(P, window=W)
    z_stream = []
    for x in v:
        st, z = seasonal_zscore_update(st, x, P)
        z_stream.append(float(z))
    np.testing.assert_allclose(z_arr, np.asarray(z_stream), rtol=1e-5,
                               atol=1e-5)
    # gate: no output before lags*period + window history exists
    assert (z_arr[: 3 * P + W] == 0).all()
    assert (z_arr[3 * P + W:] != 0).any()

    import pytest

    with pytest.raises(ValueError, match="odd"):
        seasonal_zscore_init(P, window=W, lags=2)
