"""Recover a zombie axon TPU worker.

Symptom (see CLAUDE.md "Environment gotchas"): after a device-side OOM
or an aborted dispatch, tiny programs still run but any big program's
host reads block forever, across fresh processes. This script forces a
clean run-time ResourceExhausted (which makes the worker reset its
state), waits, then verifies health with (1) a matmul and (2) a real
64-step HTM scan — the second is the one that actually catches the
zombie state.

    python scripts/tpu_reset.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


_TRIGGER = """
import jax, jax.numpy as jnp
try:
    xs = [jnp.ones((32768, 32768), jnp.float32) * i for i in range(5)]
    print(float(sum(x.sum() for x in xs)))
except Exception as e:
    print(f"reset trigger: {type(e).__name__}", flush=True)
"""


def main():
    # The over-allocation runs in a SUBPROCESS: the axon worker only
    # releases the trigger's 4 GB buffers when their owning client
    # process exits (an in-process del + gc.collect measured
    # insufficient — the health scan below still OOMed).
    import subprocess

    r = subprocess.run([sys.executable, "-c", _TRIGGER],
                       capture_output=True, text=True, timeout=600)
    print(r.stdout.strip() or r.stderr.strip()[-200:], flush=True)
    time.sleep(20)

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    x = jnp.ones((512, 512))
    print(f"matmul health: {float((x @ x).sum()):.0f}", flush=True)

    from bithtm_tpu import htm_init_batch, htm_scan, make_htm_config
    from bithtm_tpu.utils.profiling import drain

    cfg = make_htm_config(
        input_dim=1000, column_dim=2048, cell_dim=32,
        segments_per_column=4, synapse_capacity=64,
        sp_overrides={"permanence_dtype": "int16"},
    )
    state = htm_init_batch(jax.random.key(0), cfg, 32)
    seq = jnp.asarray(np.random.RandomState(0).rand(64, 32, 1000) < 0.2)
    t0 = time.perf_counter()
    state, metrics = htm_scan(cfg, state, seq, True)
    drain(metrics["bursting"])
    print(f"HTM scan health: 64 steps x 32 streams in "
          f"{time.perf_counter() - t0:.1f}s (includes compile) — worker OK",
          flush=True)


if __name__ == "__main__":
    main()
