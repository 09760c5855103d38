"""Full-step oracle parity ON THE TPU BACKEND.

The pytest suite runs on the CPU backend (tests/conftest.py), where the
TM step takes the pure-XLA path; the Pallas kernels are separately
verified against that path in interpret mode and, standalone, on
hardware. This script closes the loop end to end: it runs the complete
jitted TM step — compiled Mosaic kernels included — on the real chip
and compares every step bit-exactly against the NumPy oracle
(the role of the reference's oracle substitution,
`/root/reference/bithtm/reference_implementations.py:211`).

Sizes:
  tiny (default) — C=32, D=4, A=5, scaled-down thresholds; fast smoke.
  mid — C=512, D=32, A=41, the reference's real thresholds 15/15/32 and
    G=8/K=48 pools (the config of
    tests/test_tm_parity.py::test_parity_midscale_real_thresholds),
    driven by a repeating 6-pattern cycle with occasional noise so
    matching/active segments, reinforcement, and punishment all fire at
    a realistic A=41 kernel shape.

--sp additionally runs the production SP step (`sp_step`: packed
AND-popcount overlap + sparse-row Hebbian update — the path every bench
and driver run dispatches) for 30 learning steps against the NumPy SP
model (int16: bit-exact; f32: 1e-5). The rejected fused Pallas SP
kernel (`sp_update_pack_tpu`, see docs/PERFORMANCE.md "Tried and
rejected") is NOT in this loop; its parity lives in tests/test_pallas.py.

Run: python scripts/tpu_parity_check.py [--size tiny|mid|full|bisect]
[--steps N] [--sp] — `full` is the bench default config (2048 x 32,
fast stack), i.e. the exact compiled kernels behind the headline
number; `bisect` (C=4096, D=64, A=82) dispatches the bisection-gather
matcher (A >= 64), the form the 16K x 64 scaled config runs.
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bithtm_tpu import TMConfig, tm_init
from bithtm_tpu.models.temporal_memory import tm_step
from bithtm_tpu.oracle.bami import OracleDecisions, OracleTM
from bithtm_tpu.oracle.transplant import extract_decisions


def make_cfg(size: str) -> TMConfig:
    if size == "tiny":
        return TMConfig(
            column_dim=32, cell_dim=4, active_columns=5,
            segments_per_column=4, synapse_capacity=32,
            segment_activation_threshold=2, segment_matching_threshold=2,
            segment_sampling_synapses=4,
            permanence_initial=0.2137, permanence_increment=0.1003,
            permanence_decrement=0.0997, permanence_punishment=0.0251,
        )
    if size == "mid":
        return TMConfig(
            column_dim=512, cell_dim=32, active_columns=41,
            segments_per_column=8, synapse_capacity=48,
            segment_activation_threshold=15, segment_matching_threshold=15,
            segment_sampling_synapses=32,
        )
    if size == "bisect":
        # A=82 >= BISECT_MIN_ACTIVE (ops/pallas_kernels.py:26): this
        # dispatches the bisection-gather matcher — the form the entire
        # 16K x 64 story runs — which the r3 parity runs never touched
        # (their A=41 configs dispatch the salted-hash matcher).
        # D=64 makes the active-cell bitset multi-word (W=2), C=4096
        # keeps a chip run short at the real thresholds.
        return TMConfig(
            column_dim=4096, cell_dim=64, active_columns=82,
            segments_per_column=4, synapse_capacity=64,
            segment_activation_threshold=15, segment_matching_threshold=15,
            segment_sampling_synapses=32,
        )
    # full: the bench default config (fast stack G=4/K=64, 2048 x 32,
    # A=41) — verifies the exact compiled table/activation kernels the
    # headline benchmark runs, not a scaled-down stand-in
    assert size == "full", size
    return TMConfig(
        column_dim=2048, cell_dim=32, active_columns=41,
        segments_per_column=4, synapse_capacity=64,
        segment_activation_threshold=15, segment_matching_threshold=15,
        segment_sampling_synapses=32,
    )


def make_cols_fn(cfg: TMConfig, size: str, rng: np.random.RandomState):
    if size == "tiny":
        return lambda t: np.sort(
            rng.choice(cfg.column_dim, cfg.active_columns, replace=False)
        ).astype(np.int32)
    # mid: repeating pattern cycle (predictions/matching actually form
    # at threshold 15), occasional one-column noise swap
    patterns = [
        np.sort(np.random.RandomState(100 + i).choice(
            cfg.column_dim, size=cfg.active_columns, replace=False
        )).astype(np.int32)
        for i in range(6)
    ]

    def cols_fn(t):
        base = patterns[t % len(patterns)]
        if rng.rand() < 0.2:
            base = base.copy()
            repl = rng.randint(cfg.column_dim)
            if repl not in base:
                base[rng.randint(len(base))] = repl
                base = np.sort(base)
        return base

    return cols_fn


def run_tm_parity(size: str, steps: int) -> None:
    backend = jax.default_backend()
    cfg = make_cfg(size)
    step_fn = jax.jit(
        functools.partial(tm_step, cfg),
        static_argnames=("learning", "compute_winner", "return_debug"),
    )
    state = tm_init(cfg)
    oracle = OracleTM(cfg)
    rng = np.random.RandomState(42)
    key = jax.random.key(42)
    cols_fn = make_cols_fn(cfg, size, rng)

    for t in range(steps):
        cols = cols_fn(t)
        key, sub = jax.random.split(key)
        # mixed schedule: inference steps exercise the fused
        # activation+connected kernel (synapse_activation_conn), the
        # learning steps the table kernel
        learning = t % 5 != 3
        if learning:
            state, out, debug = step_fn(
                state, sub, jnp.asarray(cols), learning=True,
                return_debug=True,
            )
            dec = extract_decisions(jax.device_get(debug))
        else:
            state, out = step_fn(state, sub, jnp.asarray(cols),
                                 learning=False)
            dec = OracleDecisions(
                winner_cells=set(
                    np.nonzero(np.asarray(out.winner_mask))[0].tolist()
                ),
                learning_segments=set(), new_segments=[], grown={},
            )
        oracle.step(cols, dec, learning=learning)
        oracle.compare(jax.device_get(state))
    pool = jax.device_get(state.seg_cell)
    occ = int((pool < cfg.cell_dim).sum())
    print(f"{backend}-backend TM parity [{size}: C={cfg.column_dim} "
          f"D={cfg.cell_dim} A={cfg.active_columns} "
          f"G={cfg.segments_per_column}/K={cfg.synapse_capacity} "
          f"thr={cfg.segment_matching_threshold}]: {steps} mixed "
          f"learning/inference steps bit-exact vs oracle "
          f"(pool occupancy {occ} segments)"
          + (" (compiled Pallas kernels in the loop)"
             if backend == "tpu" else ""))


def run_sp_parity(steps: int = 30) -> None:
    """Compiled production SP step vs the NumPy SP model, both dtypes."""
    from bithtm_tpu import SPConfig, sp_init
    from bithtm_tpu.models.spatial_pooler import sp_step

    backend = jax.default_backend()
    for dtype in ("int16", "float32"):
        cfg = SPConfig(input_dim=1000, column_dim=2048, active_columns=41,
                       permanence_dtype=dtype)
        I = cfg.input_dim
        state = sp_init(jax.random.key(7), cfg)
        step_fn = jax.jit(functools.partial(sp_step, cfg),
                          static_argnames=("learning",))
        if cfg.quantized:
            perm = np.asarray(state.permanence)[:, :I].astype(np.int64)
            inc, dec = (cfg.to_units(cfg.permanence_increment),
                        cfg.to_units(cfg.permanence_decrement))
            thr = cfg.to_units(cfg.permanence_threshold)
        else:
            perm = np.asarray(state.permanence)[:, :I].astype(np.float64)
            inc, dec = cfg.permanence_increment, cfg.permanence_decrement
            thr = cfg.permanence_threshold
        duty = np.zeros(cfg.column_dim, np.float32)
        rng = np.random.RandomState(11)
        for t in range(steps):
            x = rng.rand(I) < 0.2
            state, out = step_fn(state, jnp.asarray(x), learning=True)
            weight = perm >= thr
            overlaps = (weight & x).sum(axis=1)
            factor = np.exp(-(cfg.boosting_intensity / cfg.density) * duty)
            boosted = factor.astype(np.float32) * overlaps.astype(np.float32)
            order = np.lexsort((np.arange(len(boosted)), -boosted))
            active = np.sort(order[: cfg.active_columns])
            perm[active] += x * (inc + dec) - dec
            if cfg.quantized:
                perm = np.clip(perm, -32000, 32000)
            duty = duty * cfg.duty_cycle_momentum
            duty[active] += 1.0 - cfg.duty_cycle_momentum
            np.testing.assert_array_equal(
                np.asarray(out.overlaps), overlaps)
            np.testing.assert_array_equal(
                np.sort(np.asarray(out.active_columns)), active)
            got = np.asarray(state.permanence)[:, :I]
            if cfg.quantized:
                np.testing.assert_array_equal(got.astype(np.int64), perm)
            else:
                np.testing.assert_allclose(got, perm, atol=1e-5)
        print(f"{backend}-backend SP parity [{dtype}, 2048x1000]: "
              f"{steps} learning steps "
              + ("bit-exact" if cfg.quantized else "within 1e-5")
              + " vs NumPy model"
              + (" (compiled production SP step in the loop)"
                 if backend == "tpu" else ""))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=("tiny", "mid", "full", "bisect"),
                   default="tiny")
    p.add_argument("--steps", type=int, default=0,
                   help="default: 80 (tiny) / 60 (mid) / 40 (full/bisect)")
    p.add_argument("--sp", action="store_true",
                   help="also check the compiled SP kernel")
    args = p.parse_args()
    print(f"backend: {jax.default_backend()} ({jax.devices()})")
    steps = args.steps or {"tiny": 80, "mid": 60, "full": 40,
                           "bisect": 40}[args.size]
    run_tm_parity(args.size, steps)
    if args.sp:
        run_sp_parity()


if __name__ == "__main__":
    main()
