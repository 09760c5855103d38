"""Adversarial anomaly benchmark: the encoder -> HTM -> likelihood ->
window-scoring stack on data designed to make it FAIL, not to showcase
it (round-3 VERDICT #2: `anomaly_detection.py`'s F1 1.00 on its own
easy task discriminates nothing).

Eight tasks, each a scalar stream with NAB-style ground-truth windows
and a probation period, spanning the failure modes the easy demo never
exercises:

  spike          clean seasonal + one point spike (the easy baseline)
  freq_change    behavior change: frequency doubles (easy baseline #2)
  noisy_spike    the same point spike buried in sigma=0.12 noise
  level_shift    a subtle +0.35 mean shift (a fraction of the signal
                 amplitude) that never leaves the normal value range
  noise_regime   variance change sigma 0.04 -> 0.30, mean unchanged
  contextual     one period replayed half a period out of phase: every
                 VALUE is individually normal, only the (value, time)
                 pairing is anomalous — detectable only through the
                 time encoder
  drift_fp       a slow linear drift (NOT an anomaly) underneath the
                 seasonal signal, plus one real spike: non-stationarity
                 as false-positive pressure
  clean_fp       an anomaly-free noisy trace: every alert is a false
                 positive

Scoring is window-level precision / recall / F1 over --seeds runs
(alert = likelihood >= 0.99999, the NAB standard threshold, OR
|seasonal windowed z-score| >= 5 — the round-5 residual side detector
— after probation; episodes merged at half a period), matching
`examples/anomaly_detection.py`. The two *_fp tasks report
false-positive counts (there is nothing to recall).

History: round 4 ran likelihood-only at the permissive 0.99 threshold
and honestly scored F1 0.00 on noisy_spike / drift_fp with a 3-5-alert
clean-trace FP floor — chronic noise and drift flood the likelihood
model's own score distribution (docs/PERFORMANCE.md "Anomaly
benchmark"). The round-5 `seasonal_zscore` stage (median-of-lags
residual, windowed z) is immune to both failure modes and carries the
point/level anomalies, which lets the likelihood threshold rise to the
NAB standard: measured at 3 seeds, every scoreable task is F1 1.00
with ZERO clean-trace FPs (ablations in PERFORMANCE.md). This suite
remains adversarial against the likelihood-only path (run
`--z_alert 0` to reproduce the round-4 failures).
Run: python examples/anomaly_benchmark.py [--cpu] [--seeds N]
[--tasks spike,clean_fp,...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PERIOD = 24
CYCLES = 60
PROBATION_CYCLES = 35


def _base(t):
    return np.sin(2 * np.pi * t / PERIOD)


def make_task(name, rng):
    """Returns (values (T,), windows [(s,e)], fp_only: bool)."""
    T = CYCLES * PERIOD
    t = np.arange(T)
    v = _base(t)
    w = []
    fp_only = False
    if name == "spike":
        at = 45 * PERIOD + PERIOD // 2
        v[at] = 1.5
        w = [(at - PERIOD // 2, at + PERIOD // 2)]
    elif name == "freq_change":
        ch = 50 * PERIOD
        v[ch:] = np.sin(2 * np.pi * t[ch:] / (PERIOD / 2))
        w = [(ch, ch + 3 * PERIOD)]
    elif name == "noisy_spike":
        v = v + rng.normal(0, 0.12, T)
        at = 45 * PERIOD + PERIOD // 2
        v[at] = 1.45
        w = [(at - PERIOD // 2, at + PERIOD // 2)]
    elif name == "level_shift":
        ch = 46 * PERIOD
        v = v + rng.normal(0, 0.05, T)
        v[ch:] += 0.35
        w = [(ch, ch + 3 * PERIOD)]
    elif name == "noise_regime":
        ch = 48 * PERIOD
        noise = rng.normal(0, 0.04, T)
        noise[ch:] = rng.normal(0, 0.30, T - ch)
        v = v + noise
        w = [(ch, ch + 3 * PERIOD)]
    elif name == "contextual":
        at = 45 * PERIOD
        # replay one period half a period out of phase: values stay in
        # range, only the value-vs-time-of-day pairing is wrong
        v[at:at + PERIOD] = _base(t[at:at + PERIOD] + PERIOD // 2)
        v = v + rng.normal(0, 0.03, T)
        w = [(at, at + PERIOD)]
    elif name == "drift_fp":
        v = v + np.linspace(0.0, 0.6, T) + rng.normal(0, 0.03, T)
        at = 45 * PERIOD + PERIOD // 2
        v[at] = 1.9
        w = [(at - PERIOD // 2, at + PERIOD // 2)]
    elif name == "clean_fp":
        v = v + rng.normal(0, 0.05, T)
        w = []
        fp_only = True
    else:
        raise ValueError(name)
    return v, w, fp_only


TASKS = ("spike", "freq_change", "noisy_spike", "level_shift",
         "noise_regime", "contextual", "drift_fp", "clean_fp")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--alert_nlog10", type=float, default=5.0,
                   help="likelihood alert threshold as -log10(1 - L); "
                        "5.0 = the NAB standard 0.99999 (viable since "
                        "the z-stage carries the point/level anomalies "
                        "that needed the old permissive 2.0)")
    p.add_argument("--z_alert", type=float, default=5.0,
                   help="side-detector threshold on |seasonal windowed "
                        "z-score| (the round-4 failure-mode mitigation: "
                        "noise/drift flood the likelihood model's score "
                        "distribution, the residual stage is immune to "
                        "both); 0 disables the stage")
    p.add_argument("--z_window", type=int, default=4 * PERIOD)
    p.add_argument("--tasks", default=",".join(TASKS))
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
        seasonal_zscore,
    )
    from bithtm_tpu.encoders import concat

    value_enc = ScalarEncoder(-2.2, 2.2, size=256, active_bits=17)
    time_enc = CyclicEncoder(float(PERIOD), size=96, active_bits=9)
    cfg = make_htm_config(
        input_dim=value_enc.size + time_enc.size,
        column_dim=512, cell_dim=8, active_columns=16,
        segment_activation_threshold=8, segment_matching_threshold=8,
        segment_sampling_synapses=16,
        sp_overrides={"boosting_intensity": 0.05},
    )
    probation = PROBATION_CYCLES * PERIOD
    t = np.arange(CYCLES * PERIOD)

    @jax.jit
    def likelihoods(scores):
        def f(st, s):
            st, lik = anomaly_likelihood_update(
                st, s, short_momentum=0.7, exclude_recent=PERIOD)
            return st, lik
        _, lik = jax.lax.scan(f, anomaly_likelihood_init(window=300),
                              scores)
        return lik

    table = []
    for name in args.tasks.split(","):
        per_seed = []
        for seed in range(args.seeds):
            rng = np.random.RandomState(7000 + 13 * seed)
            values, windows, fp_only = make_task(name, rng)
            x = np.asarray(concat(
                value_enc(jnp.asarray(values)),
                time_enc(jnp.asarray(t, dtype=jnp.float32)),
            ))
            state = htm_init(jax.random.key(seed), cfg)
            state, metrics = htm_scan(cfg, state, jnp.asarray(x), True)
            raw = jnp.asarray(metrics["anomaly"], jnp.float32)
            nlog = -np.log10(np.maximum(
                1.0 - np.asarray(likelihoods(raw)), 1e-12))
            fire = nlog >= args.alert_nlog10
            if args.z_alert > 0:
                # seasonal-residual windowed z-score side detector:
                # catches the point/level anomalies that chronic noise
                # or drift hide from the likelihood model (the round-4
                # measured failure modes)
                z = np.asarray(seasonal_zscore(
                    jnp.asarray(values), PERIOD, window=args.z_window))
                fire = fire | (np.abs(z) >= args.z_alert)
            detect = np.flatnonzero(
                fire & (np.arange(len(nlog)) >= probation))
            episodes = alert_episodes(detect, merge_gap=PERIOD // 2)
            r = score_alert_windows(episodes, windows)
            r["fp_only"] = fp_only
            per_seed.append(r)
        if per_seed[0]["fp_only"]:
            fps = [r["fp"] for r in per_seed]
            table.append((name, None, None, None, fps))
            print(f"{name:13s} FP alerts/seed: {fps}  (anomaly-free "
                  f"trace; any alert is false)")
        else:
            pr = np.array([r["precision"] for r in per_seed])
            rc = np.array([r["recall"] for r in per_seed])
            f1 = np.array([r["f1"] for r in per_seed])
            fps = [r["fp"] for r in per_seed]
            table.append((name, pr.mean(), rc.mean(), f1.mean(), fps))
            print(f"{name:13s} precision {pr.mean():.2f} "
                  f"recall {rc.mean():.2f} F1 {f1.mean():.2f} "
                  f"(FP/seed {fps})")

    print("\n| task | precision | recall | F1 |")
    print("|---|---|---|---|")
    for name, pr, rc, f1, fps in table:
        if pr is None:
            print(f"| {name} | — | — | FP/seed {fps} |")
        else:
            print(f"| {name} | {pr:.2f} | {rc:.2f} | {f1:.2f} |")


if __name__ == "__main__":
    main()
