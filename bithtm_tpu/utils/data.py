"""Host-side data pipeline: prefetch input SDR chunks to the device.

The reference generates each step's input inline on the host
(`example.py:34,52`), serializing data generation with compute. For
production streams (batched, chunked under `lax.scan`) the host must
stay ahead of the device: `prefetch_to_device` runs the producer in a
background thread and keeps `buffer_size` chunks resident on device, so
`htm_scan` consumes one while the next transfers.

Also provides the reference driver's synthetic workload as a generator
(`noisy_pattern_chunks`) so benchmarks and examples share one data path.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterable, Iterator

import jax
import numpy as np


def prefetch_to_device(chunks: Iterable, buffer_size: int = 2,
                       device=None) -> Iterator:
    """Iterate `chunks` (host arrays / pytrees), transferring each with
    `jax.device_put` from a background thread, keeping up to
    `buffer_size` chunks in flight. Yields device arrays in order.

    Producer exceptions re-raise at the consumer; iteration stops
    cleanly when the producer is exhausted.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = object()
    abandoned = threading.Event()

    def put(item) -> bool:
        # bounded put that gives up if the consumer abandoned iteration,
        # so the thread (and its queued device buffers) never leak
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for c in chunks:
                if not put(jax.device_put(c, device)):
                    return
            put(stop)
        except BaseException as e:  # surface in consumer
            put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer done or bailed early: release the producer and
        # interleave draining with short joins until the thread is
        # gone — draining unblocks a producer stuck on a full queue,
        # and only after the thread has exited can no further q.put
        # race the final drain (so no device buffer stays referenced
        # by the abandoned queue). The producer exits promptly once
        # any in-flight device_put returns; if it is wedged inside the
        # user's iterator or a hung transfer, give up after a bounded
        # deadline and abandon the daemon thread rather than hanging
        # the consumer's generator-close forever.
        abandoned.set()
        deadline = time.monotonic() + 5.0
        while t.is_alive() and time.monotonic() < deadline:
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.05)
        if t.is_alive():
            import warnings

            warnings.warn(
                "prefetch_to_device: producer thread did not exit within "
                "5s of consumer teardown (blocked in the chunks iterator "
                "or a device transfer); abandoning the daemon thread.",
                stacklevel=2,
            )
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


def noisy_pattern_chunks(
    rng: np.random.RandomState,
    patterns: np.ndarray,          # (P, I) bool base patterns
    chunk_steps: int,
    num_chunks: int,
    batch: int | None = None,      # None = single stream
    noise: float = 0.05,
) -> Iterator[np.ndarray]:
    """The reference driver's workload (`example.py:34,52`): cycle the
    pattern sequence, XOR-ing per-step Bernoulli noise; yields
    [T, I] (or [T, B, I]) bool chunks."""
    P, I = patterns.shape
    pos = 0
    for _ in range(num_chunks):
        idx = (pos + np.arange(chunk_steps)) % P
        pos = (pos + chunk_steps) % P
        base = patterns[idx]                        # (T, I)
        if batch is None:
            out = base ^ (rng.rand(chunk_steps, I) < noise)
        else:
            out = base[:, None, :] ^ (
                rng.rand(chunk_steps, batch, I) < noise
            )
        yield out
