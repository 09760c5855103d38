"""End-to-end streaming anomaly detection with a NAB-style task score.

A periodic scalar signal with timestamps is encoded to SDRs, streamed
through a learning HTM, and scored with the Numenta anomaly pipeline:
raw score (fraction of active columns not predicted) -> anomaly
*likelihood* (Gaussian tail probability of the short-term mean score
under the stream's own running distribution) -> thresholded alerts.
The reference only prints raw column counts (`example.py:55-65`); the
likelihood post-processor is the production-serving layer on top.

The script injects two anomalies — a point spike and a behavior
change — and reports the NAB-style *task-level* score: alerts are
matched against ground-truth anomaly windows, and window-level
precision / recall / F1 are printed per seed and aggregated. An alert
is a maximal run of above-threshold steps (gap <= half a period);
a window counts as detected if any alert overlaps it; alerts
overlapping no window are false positives.

Run: python examples/anomaly_detection.py [--cpu] [--seeds N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--alert_nlog10", type=float, default=2.0,
                   help="alert when -log10(1 - likelihood) >= this "
                        "(2.0 == likelihood 0.99)")
    p.add_argument("--log", default=None, help="JSONL metrics path")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bithtm_tpu import (
        CyclicEncoder,
        ScalarEncoder,
        alert_episodes,
        anomaly_likelihood_init,
        anomaly_likelihood_update,
        htm_init,
        htm_scan,
        make_htm_config,
        score_alert_windows,
    )
    from bithtm_tpu.encoders import concat

    period = 24
    value_enc = ScalarEncoder(-1.5, 1.5, size=256, active_bits=17)
    time_enc = CyclicEncoder(float(period), size=96, active_bits=9)
    cfg = make_htm_config(
        input_dim=value_enc.size + time_enc.size,
        column_dim=512, cell_dim=8, active_columns=16,
        segment_activation_threshold=8, segment_matching_threshold=8,
        segment_sampling_synapses=16,
        sp_overrides={"boosting_intensity": 0.05},
    )

    # signal: clean cycles, a point spike at cycle 45, then a frequency
    # change for the last 10 cycles
    t = np.arange(60 * period)
    values = np.sin(2 * np.pi * t / period)
    change = 50 * period
    values[change:] = np.sin(2 * np.pi * t[change:] / (period / 2))
    spike_at = 45 * period + period // 2
    values[spike_at] = 1.5                               # point anomaly

    # ground-truth anomaly windows (NAB marks a tolerance window around
    # each labeled anomaly) + probation period (model still learning)
    windows = [
        (spike_at - period // 2, spike_at + period // 2),
        (change, change + 3 * period),
    ]
    probation = 35 * period

    x = np.asarray(concat(
        value_enc(jnp.asarray(values)),
        time_enc(jnp.asarray(t, dtype=jnp.float32)),
    ))

    @jax.jit
    def likelihoods(scores):
        def f(st, s):
            st, lik = anomaly_likelihood_update(
                st, s, short_momentum=0.7, exclude_recent=period)
            return st, lik
        _, lik = jax.lax.scan(f, anomaly_likelihood_init(window=300),
                              scores)
        return lik

    results = []
    logger = None
    if args.log:
        from bithtm_tpu.utils.metrics_log import JsonlLogger

        logger = JsonlLogger(args.log)

    for seed in range(args.seeds):
        state = htm_init(jax.random.key(seed), cfg)
        state, metrics = htm_scan(cfg, state, jnp.asarray(x), True)
        raw = jnp.asarray(metrics["anomaly"], jnp.float32)
        nlog = -np.log10(np.maximum(1.0 - np.asarray(likelihoods(raw)),
                                    1e-12))
        detect = np.flatnonzero(
            (nlog >= args.alert_nlog10) & (np.arange(len(nlog)) >= probation)
        )
        episodes = alert_episodes(detect, merge_gap=period // 2)
        r = score_alert_windows(episodes, windows)
        r["alerts"] = [(int(a), int(b)) for a, b in episodes]
        results.append(r)
        print(f"seed {seed}: alerts at {r['alerts']} -> "
              f"TP {r['tp']}/{len(windows)} windows, FP {r['fp']} | "
              f"precision {r['precision']:.2f} recall {r['recall']:.2f} "
              f"F1 {r['f1']:.2f}")
        if logger is not None:
            for step in range(len(raw)):
                logger.write({"seed": seed, "value": float(values[step]),
                              "anomaly": float(raw[step]),
                              "nlog10_likelihood": float(nlog[step])})

    if logger is not None:
        logger.close()

    f1 = np.array([r["f1"] for r in results])
    rec = np.array([r["recall"] for r in results])
    prec = np.array([r["precision"] for r in results])
    print(f"\ntask score over {args.seeds} seeds "
          f"(spike + behavior-change windows, alert threshold "
          f"likelihood >= {1 - 10 ** -args.alert_nlog10:.2f}):")
    print(f"  precision {prec.mean():.2f} +/- {prec.std():.2f}   "
          f"recall {rec.mean():.2f} +/- {rec.std():.2f}   "
          f"F1 {f1.mean():.2f} +/- {f1.std():.2f}")
    assert f1.mean() >= 0.9, "anomaly task score regressed"
    print("anomaly detection works.")


if __name__ == "__main__":
    main()
