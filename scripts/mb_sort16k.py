"""Microbench: growth-selection alternatives at the 16K geometry.

The 16K x 64 step spends ~11 ms (20%) in ONE (B, L, Wc) = (64, 656, 768)
f32+s32 pair sort (`_select_and_fill` method="sortfill") that only needs
the kk=32 smallest priorities per row. Candidates measured here:

  1. full pair sort (current)
  2. full payload-free u32 sort (the `sortfill_packed` form)
  3. lax.top_k (XLA TopK) on negated s32 keys, k=32
  4. block-halving top-k WITH payload: repeatedly sort 2m-wide blocks,
     keep the m smallest of each, halving the width until m remains —
     exact top-m (an evicted element implies m smaller ones in-block)
  5. block-halving on packed u32, payload-free

Inputs are loop-CARRIED (rolled each iteration) so XLA cannot hoist the
sort out of the timing scan — the first version of this bench had
loop-invariant args and measured only the roll. A roll-only baseline is
printed for subtraction.

Run from /root/repo on the axon chip: python scripts/mb_sort16k.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bithtm_tpu.utils.profiling import drain

B, L, Wc = 64, 656, 768
KK = 32
STEPS = 30


def bench(name, fn, *arrays):
    """Time fn(*arrays) with arrays rolled one row per iteration."""

    def step(carry, _):
        arrs = carry
        out = fn(*arrs)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(l.reshape(-1)[0].astype(jnp.float32) for l in leaves)
        arrs = tuple(jnp.roll(a, 1, axis=0) for a in arrs)
        # fold the output back so the selection cannot be dead-coded
        arrs = tuple(
            a if a.dtype != jnp.float32 else a + 0.0 * s for a in arrs
        )
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
    print(f"{name:46s} {dt:8.3f} ms/iter")
    return dt


def block_topk(key_arrs, m):
    """Exact smallest-m per row by block-halving; key_arrs is a tuple
    (primary_key, *payloads); returns same tuple with last axis m."""
    arrs = key_arrs
    w = arrs[0].shape[-1]
    while w > m:
        pad = (-w) % (2 * m)
        if pad:
            arrs = tuple(
                jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                        constant_values=(jnp.inf if a.dtype == jnp.float32
                                         else 0))
                for a in arrs
            )
            w += pad
        shp = arrs[0].shape[:-1]
        arrs = tuple(a.reshape(*shp, w // (2 * m), 2 * m) for a in arrs)
        arrs = jax.lax.sort(arrs, dimension=-1, num_keys=1, is_stable=False)
        arrs = tuple(a[..., :m].reshape(*shp, (w // (2 * m)) * m)
                     for a in arrs)
        w = (w // (2 * m)) * m
    return arrs


def block_topk_u32(key, m):
    """Payload-free u32 variant (sentinel 0xFFFFFFFF pads/sorts last)."""
    w = key.shape[-1]
    while w > m:
        pad = (-w) % (2 * m)
        if pad:
            key = jnp.pad(key, [(0, 0)] * (key.ndim - 1) + [(0, pad)],
                          constant_values=0xFFFFFFFF)
            w += pad
        shp = key.shape[:-1]
        key = key.reshape(*shp, w // (2 * m), 2 * m)
        key = jax.lax.sort(key, dimension=-1, is_stable=False)
        key = key[..., :m].reshape(*shp, (w // (2 * m)) * m)
        w = (w // (2 * m)) * m
    return key


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pri = jax.random.uniform(k1, (B, L, Wc), jnp.float32)
    val = jax.random.randint(k2, (B, L, Wc), 0, 16384 * 64, jnp.int32)
    keyu = jax.random.bits(k3, (B, L, Wc), jnp.uint32) >> jnp.uint32(1)

    bench("roll-only baseline (f32+s32)",
          lambda p, v: (p[:, :1, :1], v[:, :1, :1]), pri, val)
    bench("full pair sort (f32 key, s32 payload)",
          lambda p, v: jax.lax.sort((p, v), dimension=-1, num_keys=1,
                                    is_stable=False), pri, val)
    bench("full payload-free u32 sort",
          lambda p, x: jax.lax.sort(x, dimension=-1, is_stable=False),
          pri, keyu.astype(jnp.int32))
    bench("lax.top_k(-key s32, 32)",
          lambda p, x: jax.lax.top_k(-x, KK), pri,
          keyu.astype(jnp.int32))
    bench("block-halving top-32 (f32 key + s32 payload)",
          lambda p, v: block_topk((p, v), KK), pri, val)
    bench("block-halving top-32 (u32 payload-free)",
          lambda p, x: block_topk_u32(x.astype(jnp.uint32), KK).astype(
              jnp.int32), pri, keyu.astype(jnp.int32))


if __name__ == "__main__":
    main()
