"""Minimal isolation probe for the frozen serving path on the chip.

Runs htm_serve_scan (or plain inference htm_scan with --plain) several
times back-to-back with loud per-call progress, to isolate where a
dispatch wedges. Small T keeps each dispatch ~1 s.

    python scripts/mb_serve_probe.py [--plain] [--calls 4] [--steps 48]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--plain", action="store_true")
p.add_argument("--winners", action="store_true")
p.add_argument("--no_donate", action="store_true")
p.add_argument("--calls", type=int, default=4)
p.add_argument("--steps", type=int, default=48)
p.add_argument("--batch", type=int, default=256)
p.add_argument("--column_dim", type=int, default=2048)
p.add_argument("--cell_dim", type=int, default=32)
args = p.parse_args()

import jax
import jax.numpy as jnp

from bithtm_tpu import htm_init_batch, htm_scan, htm_serve_scan, make_htm_config
from bithtm_tpu.utils.profiling import drain

print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

cfg = make_htm_config(
    input_dim=1000, column_dim=args.column_dim, cell_dim=args.cell_dim,
    segments_per_column=4, synapse_capacity=64,
    sp_overrides={"permanence_dtype": "int16"},
)
B, T = args.batch, args.steps
state = htm_init_batch(jax.random.key(0), cfg, B)
rng = np.random.RandomState(0)
seq = jnp.asarray(rng.rand(T, B, 1000) < 0.2)

if args.plain:
    cw = bool(args.winners)
    run = lambda st: htm_scan(cfg, st, seq, False, 0, cw)
elif args.no_donate:
    from bithtm_tpu.models.htm import htm_serve_scan as _f

    _nd = jax.jit(_f.__wrapped__, static_argnums=(0, 3, 4, 5))
    run = lambda st: _nd(cfg, st, seq, 0, bool(args.winners))
else:
    cw = bool(args.winners)
    run = lambda st: htm_serve_scan(cfg, st, seq, 0, cw)

for i in range(args.calls):
    t0 = time.perf_counter()
    state, metrics = run(state)
    drain(metrics["bursting"])
    print(f"call {i}: {time.perf_counter() - t0:.2f}s "
          f"({B * T / (time.perf_counter() - t0):,.0f} steps/s)",
          flush=True)
print("OK", flush=True)
