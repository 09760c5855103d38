"""Full-step oracle parity ON THE TPU BACKEND.

The pytest suite runs on the CPU backend (tests/conftest.py), where the
TM step takes the pure-XLA path; the Pallas kernels are separately
verified against that path in interpret mode and, standalone, on
hardware. This script closes the loop end to end: it runs the complete
jitted TM step — compiled Mosaic kernels included — on the real chip
and compares every step bit-exactly against the NumPy oracle.

Run: python scripts/tpu_parity_check.py [steps]
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bithtm_tpu import TMConfig, tm_init
from bithtm_tpu.models.temporal_memory import tm_step
from bithtm_tpu.oracle.bami import OracleTM
from bithtm_tpu.oracle.transplant import extract_decisions


def main(steps: int = 80) -> None:
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})")
    cfg = TMConfig(
        column_dim=32, cell_dim=4, active_columns=5,
        segments_per_column=4, synapse_capacity=32,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=4,
        permanence_initial=0.2137, permanence_increment=0.1003,
        permanence_decrement=0.0997, permanence_punishment=0.0251,
    )
    step_fn = jax.jit(
        functools.partial(tm_step, cfg),
        static_argnames=("learning", "compute_winner", "return_debug"),
    )
    state = tm_init(cfg)
    oracle = OracleTM(cfg)
    rng = np.random.RandomState(42)
    key = jax.random.key(42)
    from bithtm_tpu.oracle.bami import OracleDecisions

    for t in range(steps):
        cols = np.sort(
            rng.choice(cfg.column_dim, cfg.active_columns, replace=False)
        ).astype(np.int32)
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
    print(f"{backend}-backend parity: {steps} mixed learning/inference "
          f"steps bit-exact vs oracle"
          + (" (compiled Pallas kernels in the loop)"
             if backend == "tpu" else ""))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
