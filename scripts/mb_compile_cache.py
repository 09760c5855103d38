"""Probe: does JAX's persistent compilation cache work over the axon
TPU plugin, and what does it save on the full HTM step?

Run twice — the first process populates the cache, the second should
hit it:

    python scripts/mb_compile_cache.py --cache_dir /tmp/jaxcache
    python scripts/mb_compile_cache.py --cache_dir /tmp/jaxcache
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--cache_dir", default="/tmp/jaxcache")
p.add_argument("--batch", type=int, default=256)
args = p.parse_args()

import jax

jax.config.update("jax_compilation_cache_dir", args.cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from bithtm_tpu import htm_init_batch, htm_scan, make_htm_config
from bithtm_tpu.utils.profiling import drain

print(f"# devices: {jax.devices()}", file=sys.stderr)

cfg = make_htm_config(
    input_dim=1000, column_dim=2048, cell_dim=32,
    segments_per_column=4, synapse_capacity=64,
    sp_overrides={"permanence_dtype": "int16"},
)
B, T = args.batch, 16
state = htm_init_batch(jax.random.key(0), cfg, B)
seq = jnp.asarray(np.random.RandomState(0).rand(T, B, 1000) < 0.2)

t0 = time.perf_counter()
state, metrics = htm_scan(cfg, state, seq, True)
drain(metrics["bursting"])
print(f"first call (compile + {T} steps): "
      f"{time.perf_counter() - t0:.1f} s", flush=True)
