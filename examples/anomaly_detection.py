"""End-to-end streaming anomaly detection (NAB-style).

A periodic scalar signal with timestamps is encoded to SDRs, streamed
through a learning HTM, and scored with the Numenta raw anomaly metric
(fraction of active columns that were not predicted). The script injects
two anomalies — a point spike and a behavior change — and prints the
per-window anomaly scores showing both being flagged after the model
has learned the normal pattern.

Run: python examples/anomaly_detection.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log", default=None, help="JSONL metrics path")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bithtm_tpu import (
        CyclicEncoder,
        ScalarEncoder,
        htm_init,
        htm_scan,
        make_htm_config,
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

    x = np.asarray(concat(
        value_enc(jnp.asarray(values)),
        time_enc(jnp.asarray(t, dtype=jnp.float32)),
    ))
    state = htm_init(jax.random.key(0), cfg)
    state, metrics = htm_scan(cfg, state, jnp.asarray(x), True)
    anomaly = np.asarray(metrics["anomaly"])

    logger = None
    if args.log:
        from bithtm_tpu.utils.metrics_log import JsonlLogger

        logger = JsonlLogger(args.log)
        for step in range(len(anomaly)):
            logger.write({"anomaly": anomaly[step], "value": values[step]})
        logger.close()

    per_cycle = anomaly.reshape(-1, period).mean(axis=1)
    print("mean anomaly per cycle (60 cycles; behavior change at cycle 50):")
    for row in range(0, 60, 10):
        print("  " + " ".join(f"{v:.2f}" for v in per_cycle[row:row + 10]))
    learned = per_cycle[40:45].mean()
    spike_cycle = per_cycle[45]
    changed = per_cycle[50:52].mean()
    print(f"\nlearned-regime anomaly: {learned:.2f}; point-spike cycle: "
          f"{spike_cycle:.2f}; after behavior change: {changed:.2f}")
    assert spike_cycle > 1.5 * learned, "point spike should register"
    assert changed > 2 * learned, "anomaly should spike at the change"
    print("anomaly detection works.")


if __name__ == "__main__":
    main()
