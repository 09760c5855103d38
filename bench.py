"""Throughput benchmark: aggregate HTM timesteps/sec, batched streams.

Reproduces the reference driver's measurement semantics (`example.py:46-67`:
wall-clock over the full learning loop at the default 2048-column x
32-cell config) but batched over independent streams — the TPU-native
throughput axis (SURVEY.md §6 north star).

Baseline: the reference's vectorized NumPy implementation sustains
~48 timesteps/s warm on the survey container CPU (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 48.0  # reference NumPy, warm, single stream


def _run_with_timeout(fn, timeout):
    """Run fn() in a daemon thread; return (ok, value-or-None).

    On the axon tunnel a wedged worker blocks host reads forever
    (CLAUDE.md "tunnel worker intermittently goes zombie"); a plain call
    would hang until the driver's kill with nothing printed. The thread
    lets us keep the already-emitted JSON lines as the official record
    and exit with a diagnostic instead.
    """
    box = {}

    def target():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 - re-raised below
            box["error"] = e

    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        return False, None
    if "error" in box:
        raise box["error"]
    return True, box.get("value")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 256)))
    p.add_argument("--steps", type=int,
                   default=int(os.environ.get("BENCH_STEPS", 384)),
                   help="scan length per timed dispatch; 384 amortizes "
                        "the ~50 ms fixed dispatch cost to <0.2% (192 "
                        "-> 384 -> 768 measured 22,366 / 22,730 / "
                        "22,956 steps/s — the asymptote is the ~11.0 "
                        "ms/step device floor) while keeping the first "
                        "wedge-insurance emit under ~45 s")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--input_dim", type=int, default=1000)
    p.add_argument("--column_dim", type=int, default=2048)
    p.add_argument("--cell_dim", type=int, default=32)
    p.add_argument("--input_patterns", type=int, default=100)
    p.add_argument("--input_density", type=float, default=0.2)
    p.add_argument("--mode", choices=("htm", "sp", "tm"), default="htm",
                   help="htm: full pipeline (the headline metric); "
                        "sp: SpatialPooler only (BASELINE configs[1]); "
                        "tm: TemporalMemory learning only (configs[2])")
    p.add_argument("--stack", choices=("fast", "reference"), default="fast",
                   help="fast (default): the validated throughput stack — "
                        "G=4 segment slots/column, K=64 synapse slots, "
                        "int16 SP permanences. Bit-exact against the BAMI "
                        "oracle on the TPU path (example.py --oracle); "
                        "2000-step soak on the reference workload converges "
                        "to 0.16 bursting / 40.8 of 41 correct with ~1% "
                        "benign segment-cap drops (scripts/soak_fast_stack"
                        ".py, docs/PERFORMANCE.md). reference: the "
                        "reference's G=8/K=48 head-room pool with f32 SP "
                        "permanences.")
    p.add_argument("--inference", action="store_true",
                   help="learning=False (frozen graph), winner selection "
                        "still on (the reference's return_winner_cell "
                        "default)")
    p.add_argument("--serve", action="store_true",
                   help="the production serving path: htm_serve_scan over a "
                        "compact serving table (connected synapses only, "
                        "per-column packed — ops/serving.py) built from a "
                        "graph trained for --serve_warmup steps (packing an "
                        "EMPTY graph would flatter the number). Predictions "
                        "bit-identical to the unpacked inference scan.")
    p.add_argument("--serve_unpacked", action="store_true",
                   help="with --serve: skip the compact table and serve the "
                        "full pool (the pre-round-4 serving path; the "
                        "ablation baseline for the packed win)")
    p.add_argument("--serve_warmup", type=int, default=256,
                   help="learning steps used to populate the graph before "
                        "--serve freezes and packs it (untimed)")
    p.add_argument("--detailed_metrics", action="store_true",
                   help="include the full-table occupancy metrics "
                        "(tm_pool_occupancy etc.) in every step; off by "
                        "default — the serving loop keeps the driver "
                        "observables and drop counters only")
    p.add_argument("--winner_capacity", type=int, default=0,
                   help="growth-candidate list width Wc (0 = auto); the "
                        "measured-fast 16K point is 384 (with "
                        "--growth_capacity 336, 1,906 steps/s vs 1,610 "
                        "auto — adopt via htm_scan_autocap in production, "
                        "which widens drop-free)")
    p.add_argument("--growth_capacity", type=int, default=0,
                   help="growing-segment list width L (0 = auto)")
    p.add_argument("--allocation_policy", default="evict",
                   choices=("reference", "evict"),
                   help="segment-pool allocation under pressure: "
                        "'reference' (recycle-or-drop, surfaced by "
                        "counters) or 'evict' (also evict the weakest "
                        "mature slot — the analogue of the reference's "
                        "unbounded growth; see docs/PERFORMANCE.md)")
    p.add_argument("--max_seconds", type=float, default=240.0,
                   help="wall-time budget for the timed-repeat phase; "
                        "whatever best-of has been achieved when it expires "
                        "is the recorded number (wedge insurance — "
                        "BENCH_r04 timed out with zero output)")
    p.add_argument("--warmup_timeout", type=float, default=600.0,
                   help="bound on the compile+warmup dispatch (first Mosaic "
                        "compile can take minutes server-side)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--compile_cache", nargs="?", const="", default=None,
                   metavar="DIR",
                   help="persistent XLA compilation cache (warm process "
                        "start: ~115 s -> ~18 s measured over the tunnel); "
                        "optional DIR, default ~/.cache/bithtm_tpu/xla")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if args.compile_cache is not None:
        from bithtm_tpu.utils.compile_cache import enable_compilation_cache

        d = enable_compilation_cache(args.compile_cache or None)
        print(f"# compilation cache: {d}", file=sys.stderr)

    from bithtm_tpu import htm_init_batch, htm_scan, make_htm_config

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    stack_overrides = (
        dict(segments_per_column=4, synapse_capacity=64,
             sp_overrides={"permanence_dtype": "int16"})
        if args.stack == "fast" else {}
    )
    cfg = make_htm_config(
        input_dim=args.input_dim,
        column_dim=args.column_dim,
        cell_dim=args.cell_dim,
        allocation_policy=args.allocation_policy,
        winner_capacity=args.winner_capacity,
        growth_capacity=args.growth_capacity,
        **stack_overrides,
    )
    print(f"# stack: {args.stack}", file=sys.stderr)
    B, T = args.batch, args.steps

    rng = np.random.RandomState(0)
    patterns = rng.rand(args.input_patterns, B, args.input_dim) < args.input_density
    # per-step noisy inputs from a repeating pattern sequence (example.py:34,52)
    idx = np.arange(T) % args.input_patterns
    noise = rng.rand(T, B, args.input_dim) < 0.05
    seq = jnp.asarray(patterns[idx] ^ noise)

    state = htm_init_batch(jax.random.key(0), cfg, B)

    if args.serve and args.mode != "htm":
        p.error("--serve is the full-pipeline serving path; it has no "
                "--mode sp/tm form (use --inference for those)")
    learn = not (args.inference or args.serve)
    suffix = ("serving" if args.serve
              else "learning" if learn else "inference")
    shape = f"{args.column_dim}x{args.cell_dim}"
    if args.mode == "htm":
        if args.serve:
            from bithtm_tpu import htm_scan as _train_scan, htm_serve_scan

            # populate the graph before freezing: serving an empty pool
            # measures nothing real. Untimed (compile + warmup both
            # excluded by the warmup run below).
            warm = jnp.asarray(
                patterns[np.arange(args.serve_warmup) % args.input_patterns]
                ^ (rng.rand(args.serve_warmup, B, args.input_dim) < 0.05)
            )
            state, _ = _train_scan(cfg, state, warm, True)
            table = None
            if not args.serve_unpacked:
                from bithtm_tpu.ops.serving import make_serving_table

                table = make_serving_table(cfg.tm, state.tm)
                rshape = tuple(table.rows.shape)
                print(f"# serving table: rows {rshape}, ext "
                      f"{tuple(table.ext_col.shape)} (full pool: "
                      f"{(B, args.column_dim, cfg.tm.segments_per_column * cfg.tm.synapse_capacity)})",
                      file=sys.stderr)

            run = lambda st: htm_serve_scan(
                cfg, st, seq, detailed_metrics=args.detailed_metrics,
                serving_table=table)
        else:
            run = lambda st: htm_scan(
                cfg, st, seq, learn,
                detailed_metrics=args.detailed_metrics)
        metric = f"aggregate_timesteps_per_sec_{shape}_{suffix}"
    elif args.mode == "sp":
        # SpatialPooler only: overlap matmul + boosting + top-k + Hebbian
        # update, scanned over the sequence (BASELINE configs[1]).
        import functools

        from bithtm_tpu.models.spatial_pooler import sp_step

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st):
            def body(carry, x):
                new, out = jax.vmap(
                    lambda s, xx: sp_step(cfg.sp, s, xx, learn)
                )(carry, x)
                return new, out.boosted_overlaps.sum(-1)
            sp_final, boosted = jax.lax.scan(body, st.sp, seq)
            return st.replace(sp=sp_final), {"anomaly": boosted}
        metric = f"sp_only_timesteps_per_sec_{shape}_{suffix}"
    else:
        # TemporalMemory full learning driven by fixed column sequences
        # (BASELINE configs[2]); SP is bypassed with random top-k sets.
        import functools

        from bithtm_tpu.models.temporal_memory import tm_step

        A = cfg.sp.active_columns
        col_seq = jnp.asarray(np.stack([
            np.stack([np.sort(rng.choice(args.column_dim, A, replace=False))
                      for _ in range(B)])
            for _ in range(T)
        ]).astype(np.int32))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st):
            def body(carry, cols):
                tm, key = carry  # key: (B,) per-stream keys
                split = jax.vmap(lambda k: jax.random.split(k, 2))(key)
                key, subs = split[:, 0], split[:, 1]
                new_tm, out = jax.vmap(
                    lambda t, k, c: tm_step(cfg.tm, t, k, c, learning=learn)
                )(tm, subs, cols)
                return (new_tm, key), out.metrics["tm_bursting_columns"]
            (tm_final, key), burst = jax.lax.scan(
                body, (st.tm, st.key), col_seq
            )
            return st.replace(tm=tm_final, key=key), {
                "anomaly": burst.astype(jnp.float32)
            }
        metric = f"tm_only_timesteps_per_sec_{shape}_{suffix}"

    def emit(agg, note):
        # Flushed immediately: the driver parses the LAST JSON line, so
        # every completed repeat re-prints the best-so-far — a wedge
        # after repeat k still leaves repeat k's number as the record.
        print(f"# emit ({note}): {agg:,.0f} steps/s", file=sys.stderr,
              flush=True)
        print(json.dumps({
            "metric": metric,
            "value": round(agg, 1),
            "unit": "timesteps/s",
            "vs_baseline": round(agg / BASELINE_STEPS_PER_SEC, 1),
        }), flush=True)

    def bracket(tag, timeout=120.0):
        # Tiny known-good dispatch + host read. If THIS wedges, the
        # tunnel worker is gone — distinguishable in the tail output
        # from a slow benchmark compile.
        def tiny():
            x = jnp.ones((128, 128), jnp.float32)
            return float(jnp.dot(x, x)[0, 0])

        t0 = time.time()
        ok, v = _run_with_timeout(tiny, timeout)
        if ok:
            print(f"# bracket[{tag}]: ok ({v:.0f}) in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        else:
            print(f"# bracket[{tag}]: WEDGED (no host read within "
                  f"{timeout:.0f}s) — tunnel worker unresponsive",
                  file=sys.stderr, flush=True)
        return ok

    # generous: a COLD first dispatch on a healthy tunnel has measured
    # 22-52 s (fresh-process connection + compile); only a true wedge
    # should abort here
    if not bracket("pre", timeout=240.0):
        print("# aborting: device unusable before benchmark started",
              file=sys.stderr, flush=True)
        os._exit(3)

    def one_run(st):
        new_st, mets = run(st)
        # force a host read so remote-execution backends can't report
        # completion before the device work actually drains
        _ = float(np.asarray(mets["anomaly"][-1]).sum())
        jax.block_until_ready(new_st)
        return new_st, mets

    t0 = time.time()
    ok, res = _run_with_timeout(lambda: one_run(state), args.warmup_timeout)
    warm_s = time.time() - t0
    if not ok:
        print(f"# warmup WEDGED after {warm_s:.0f}s (limit "
              f"{args.warmup_timeout:.0f}s)", file=sys.stderr, flush=True)
        bracket("post-wedge", timeout=60.0)
        os._exit(3)
    state, metrics = res
    print(f"# warmup (compile + {T} steps): {warm_s:.1f}s",
          file=sys.stderr, flush=True)
    # Provisional record: compile-contaminated, replaced by the first
    # clean repeat — but if the tunnel wedges right after warmup
    # (the exact BENCH_r04 failure), this line IS the round's record.
    emit(B * T / warm_s, "provisional, compile-contaminated warmup")

    times = []
    deadline = time.time() + args.max_seconds
    for r in range(args.repeats):
        budget = deadline - time.time()
        if budget <= 0 and times:
            print(f"# stopping after {r} repeats: --max_seconds "
                  f"{args.max_seconds:.0f} budget spent",
                  file=sys.stderr, flush=True)
            break
        t0 = time.time()
        ok, res = _run_with_timeout(lambda: one_run(state),
                                    max(budget, 30.0))
        if not ok:
            print(f"# repeat {r} WEDGED after {time.time() - t0:.0f}s — "
                  f"keeping best-of-{len(times)} (or the provisional "
                  f"warmup record) as the record",
                  file=sys.stderr, flush=True)
            bracket("post-wedge", timeout=60.0)
            # a JSON record HAS been emitted by this point (at minimum
            # the provisional warmup line): exit 0 so the driver
            # treats the tail as a valid record
            os._exit(0)
        state, metrics = res
        times.append(time.time() - t0)
        best = min(times)
        if times[-1] <= best:
            emit(B * T / best, f"best after repeat {r + 1}")
    best = min(times)
    agg = B * T / best
    print(
        f"# best of {len(times)}: {best:.3f}s for {T} steps x {B} streams"
        f" = {agg:,.0f} steps/s ({best / T * 1e3:.2f} ms/step)",
        file=sys.stderr, flush=True,
    )
    if args.mode == "htm":
        print(
            f"# bursting[last-step] mean: "
            f"{np.asarray(metrics['bursting'][-1]).mean():.1f}",
            file=sys.stderr,
        )
    bracket("post")
    emit(agg, "final")


if __name__ == "__main__":
    main()
