"""Microbench: active-set matcher forms in the fused table kernel.

Per-element cost of "is this synapse's target column active, and which
cells of it fired" at the default geometry (C=2048, D=32, A=41, J=256,
B=256 vmapped streams):

  * chain  — the unrolled A-compare/select chain (A ops/element)
  * hash   — the salted-hash matcher (`pallas_kernels._match_bits_hash`):
             1 multiplicative hash + CAP*(1+W) lane-gathers + an
             OVF-wide overflow chain, independent of A

The hash-table build (salt search + scatter into probe rows) runs
inside the timed region, as it does in production.

Run from /root/repo on the axon chip: python scripts/mb_matcher.py
[--column_dim 16384 --cell_dim 64 --batch 64 --active 328] for the
scaled geometry (where the bisect form is the shipped default).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bithtm_tpu.ops import pallas_kernels as pk
from bithtm_tpu.utils.profiling import drain

STEPS = 20


def bench(name, fn, *arrays):
    def step(carry, _):
        arrs = carry
        out = fn(*arrs)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(l.reshape(-1)[0].astype(jnp.float32) for l in leaves)
        # roll the synapse table so the kernel cannot be hoisted
        arrs = (jnp.roll(arrs[0], 1, axis=0),) + arrs[1:]
        return arrs, s

    def loop(arrs):
        arrs, ss = jax.lax.scan(step, arrs, None, length=STEPS)
        return ss.sum()

    lp = jax.jit(loop)
    r = lp(arrays)
    drain(r)
    t0 = time.perf_counter()
    r = lp(arrays)
    drain(r)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms/iter")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--column_dim", type=int, default=2048)
    p.add_argument("--cell_dim", type=int, default=32)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--active", type=int, default=41)
    p.add_argument("--segments", type=int, default=4)
    p.add_argument("--synapses", type=int, default=64)
    p.add_argument("--blocks", type=str, default="",
                   help="comma list overriding the per-matcher block "
                        "sweeps (e.g. 512,1024,2048)")
    args = p.parse_args()
    C, D, A, B = args.column_dim, args.cell_dim, args.active, args.batch
    G, K = args.segments, args.synapses
    J, W = G * K, (D + 31) // 32

    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    syn = jax.random.randint(ks[0], (B, C, J), -1, C * D, jnp.int32)
    perm = jax.random.uniform(ks[1], (B, C, J), jnp.float32) - 0.3
    actp = (jax.random.uniform(ks[2], (B, C, J)) < 0.01).astype(jnp.bfloat16)
    pun = jax.random.randint(ks[3], (B, C), 0, 2 ** G, jnp.int32)
    cols = jax.vmap(
        lambda k: jax.random.choice(k, C, (A,), replace=False)
    )(jax.random.split(ks[4], B)).astype(jnp.int32)
    cols = jnp.sort(cols, axis=-1)
    bits = jax.random.bits(ks[5], (B, A, W), jnp.uint32)

    def run(block):
        def f(sy, pe, ap, pw, co, bi):
            return pk.table_update_tpu(
                sy, pe, ap, pw, co, bi, D, K, 0.01, 0.5, block=block)
        return jax.vmap(f)

    saved = pk.HASH_MAX_ACTIVE
    try:
        override = tuple(int(b) for b in args.blocks.split(",") if b)
        for name, hmax, blocks in (
            ("chain", 0 if A < pk.BISECT_MIN_ACTIVE else -1, (64, 128, 256)),
            ("hash", 10 ** 9, (64, 128, 256, 512)),
        ):
            if hmax < 0:
                continue
            if override:
                blocks = override
            pk.HASH_MAX_ACTIVE = hmax
            for blk in blocks:
                if C % blk:
                    continue
                bench(f"table kernel [{name}] block={blk}", run(blk),
                      syn, perm, actp, pun, cols, bits)
    finally:
        pk.HASH_MAX_ACTIVE = saved


if __name__ == "__main__":
    main()
