"""Single-stream (B=1) step-latency study (round-3 VERDICT #6).

The reference runs exactly one stream (`/root/reference/example.py:48-53`);
the rebuild's like-for-like number (1,898 learning steps/s = 0.53 ms/step
at the r3 state) sits ~5x over its own ~0.11 ms of device compute, and
nobody had attributed the gap. This script measures, on the current
backend:

  * learning htm_scan at B=1 (unbatched state, [T, I] inputs) across
    scan-unroll factors, detailed_metrics on/off;
  * a no-ys ablation (scan body returns None instead of the per-step
    metrics dict) to price the [T]-stacking of the ~15 metric scalars;
  * serving (htm_serve_scan, winner pass off) unpacked and with the
    compact serving table, same sweeps.

Timing: per-step = best-of-``--repeats`` wall time of one T-step
dispatch / T, with a host scalar read before trusting the clock
(axon's block_until_ready returns early — utils/profiling.drain).

Run (real TPU): python scripts/b1_latency.py [--steps 2048 --repeats 5]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--input_dim", type=int, default=1000)
    p.add_argument("--column_dim", type=int, default=2048)
    p.add_argument("--cell_dim", type=int, default=32)
    p.add_argument("--unrolls", type=str, default="4,8,16")
    p.add_argument("--serve_warmup", type=int, default=256)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the JAX_PLATFORMS env "
                        "var alone does NOT beat the axon hook)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bithtm_tpu import (htm_init, htm_scan, htm_serve_scan,
                            make_htm_config)
    from bithtm_tpu.models.htm import htm_step

    cfg = make_htm_config(
        input_dim=args.input_dim, column_dim=args.column_dim,
        cell_dim=args.cell_dim, segments_per_column=4, synapse_capacity=64,
        sp_overrides={"permanence_dtype": "int16"},
    )
    print(f"# backend: {jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    T = args.steps
    rng = np.random.RandomState(0)
    patterns = rng.rand(100, args.input_dim) < 0.2
    idx = np.arange(T) % 100
    seq = jnp.asarray(patterns[idx]
                      ^ (rng.rand(T, args.input_dim) < 0.05))

    # Each timed dispatch necessarily contains ONE host scalar read (the
    # only reliable drain on axon); on the tunnel that read costs
    # ~100 ms — a fixed per-dispatch cost, not per-step work. Measure it
    # on an already-committed array and report both raw and
    # read-adjusted ms/step (at T=2048 the difference is ~0.05 ms/step,
    # ~10% of the figure this study attributes).
    # NB: must read a FRESH tiny dispatch each probe — re-reading an
    # already-fetched buffer hits the host-side cache and measures 0.
    _base = jnp.zeros((), jnp.int32)
    _ = float(np.asarray(_base + 1))
    _reads = []
    for _i in range(3):
        _t0 = time.time()
        _ = float(np.asarray(_base + jnp.int32(2 + _i)))
        _reads.append(time.time() - _t0)
    read_s = min(_reads)
    print(f"# fixed per-dispatch host-read cost: {read_s * 1e3:.0f} ms",
          file=sys.stderr)

    def timed(run, st, label):
        t0 = time.time()
        st2, metrics = run(st)
        jax.block_until_ready(st2)
        if metrics is not None:
            _ = float(np.asarray(metrics["bursting"][-1]).sum())
        else:  # no-ys variant: force a state read instead
            _ = float(np.asarray(st2.tm.step).sum())
        compile_s = time.time() - t0
        times = []
        for _r in range(args.repeats):
            t0 = time.time()
            st2, metrics = run(st2)
            if metrics is not None:
                _ = float(np.asarray(metrics["bursting"][-1]).sum())
            else:
                _ = float(np.asarray(st2.tm.step).sum())
            jax.block_until_ready(st2)
            times.append(time.time() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]
        adj = max(best - read_s, 1e-9)
        print(f"{label}: best {best / T * 1e3:.3f} ms/step "
              f"({adj / T * 1e3:.3f} net of the {read_s * 1e3:.0f} ms "
              f"dispatch read; median {med / T * 1e3:.3f}, "
              f"{T / best:,.0f} steps/s; compile+first {compile_s:.1f}s)")
        return st2

    unrolls = [int(u) for u in args.unrolls.split(",") if u]

    # -- learning sweeps ---------------------------------------------
    for unroll in unrolls:
        for dm in (False, True):
            run = lambda st: htm_scan(cfg, st, seq, True, unroll, True, dm)
            timed(run, htm_init(jax.random.key(0), cfg),
                  f"learning B=1 unroll={unroll} detailed_metrics={dm}")

    # -- no-ys ablation: what the metric stacking costs --------------
    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def scan_noys(st, xs, unroll):
        def body(c, x):
            s, _o = htm_step(cfg, c, x, True, True,
                             detailed_metrics=False)
            return s, None
        final, _ = jax.lax.scan(body, st, xs, unroll=unroll)
        return final, None

    for unroll in unrolls:
        run = lambda st: scan_noys(st, seq, unroll)
        timed(run, htm_init(jax.random.key(0), cfg),
              f"learning B=1 unroll={unroll} NO-YS (no metric stacking)")

    # -- serving -----------------------------------------------------
    warm_seq = jnp.asarray(
        patterns[np.arange(args.serve_warmup) % 100]
        ^ (rng.rand(args.serve_warmup, args.input_dim) < 0.05)
    )
    state0, _ = htm_scan(cfg, htm_init(jax.random.key(0), cfg),
                         warm_seq, True)
    from bithtm_tpu.ops.serving import make_serving_table
    table = make_serving_table(cfg.tm, state0.tm)

    for unroll in unrolls:
        run = lambda st: htm_serve_scan(cfg, st, seq, unroll, False, False)
        state0 = timed(run, state0,
                       f"serving B=1 unpacked unroll={unroll}")
        run = lambda st: htm_serve_scan(cfg, st, seq, unroll, False, False,
                                        serving_table=table)
        state0 = timed(run, state0,
                       f"serving B=1 packed unroll={unroll}")


if __name__ == "__main__":
    main()
