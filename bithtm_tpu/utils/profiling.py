"""Tracing / profiling helpers.

The reference's only instrumentation is a wall-clock print around the
whole run (`example.py:46,67`). Here (SURVEY.md §5):

  * `trace(logdir)` — context manager around `jax.profiler` producing
    xprof/perfetto-compatible dumps (the step itself is annotated with
    `jax.named_scope("sp"/"tm")` in `models/htm.py`, so device traces
    attribute time per phase).
  * `PhaseTimer` — host-side wall-clock phase timing with explicit
    device synchronization, for quick interactive numbers without a
    trace viewer. Remote/async backends can report completion before
    work drains, so it blocks on a materialized leaf, not just
    `block_until_ready`.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block into `logdir` (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def drain(tree) -> None:
    """Block until `tree`'s computation has actually finished, by
    forcing a host read of one element of its first array leaf."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            x = leaf
            try:
                while getattr(x, "ndim", 0) > 0:
                    x = x[(0,) * x.ndim]
                np.asarray(jax.device_get(x))
            except TypeError:  # e.g. typed PRNG keys
                continue
            return
    jax.block_until_ready(tree)


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("tm_forward"):
        out = step(...)
        drain(out)
    print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name}: {total * 1e3:.1f} ms total, "
                f"{total / n * 1e3:.2f} ms/call ({n} calls)"
            )
        return "\n".join(lines)
