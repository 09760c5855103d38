"""Structured metrics logging.

The reference prints three formatted counters per step
(`example.py:55-65`). Here every step returns a full metric dict from
inside the jitted computation (prediction quality, anomaly score,
pool occupancy, capacity-drop counters — see `models/htm.py` and
`models/temporal_memory.py`); this module is the host side: summarize
per-step metric pytrees and append them to a JSONL file.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def summarize(metrics: dict, reduce_batch: bool = True) -> dict:
    """Convert a (possibly batched or [T]-stacked) metric dict of device
    arrays into plain python scalars/lists."""
    out = {}
    for k, v in metrics.items():
        a = np.asarray(v)
        if a.ndim == 0:
            out[k] = a.item()
        elif reduce_batch:
            out[k] = float(a.mean()) if a.dtype.kind == "f" else int(a.sum())
        else:
            out[k] = a.tolist()
    return out


class JsonlLogger:
    """Append-only JSONL metrics log with a monotonic step counter.

    log = JsonlLogger("run/metrics.jsonl", config=cfg_dict)
    log.write(out.metrics)            # one line per step (or epoch)
    """

    def __init__(self, path: str, config: dict | None = None):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self.step = 0
        if config is not None:
            self._emit({"event": "config", **config})

    def _emit(self, record: dict) -> None:
        record.setdefault("ts", round(time.time(), 3))
        self._f.write(json.dumps(record) + "\n")

    def write(self, metrics: dict, **extra) -> None:
        self._emit({"step": self.step, **summarize(metrics), **extra})
        self.step += 1

    def close(self) -> None:
        self._f.close()
