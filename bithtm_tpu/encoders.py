"""SDR encoders: scalars, categories, datetimes -> sparse binary vectors.

The reference operates on raw random binary patterns only (`example.py:34`);
real HTM pipelines (NAB-style anomaly detection — BASELINE.json configs[3])
need encoders that map input values to sparse distributed representations
with the classic HTM property: nearby values share active bits, distant
values share none.

All encoders are pure functions on jnp arrays, batch-friendly (leading
axes broadcast) and jittable, producing bool SDRs that feed
`HierarchicalTemporalMemory.process` / `htm_step` directly — except
`DateTimeEncoder.encode`, which needs concrete host-side datetimes
(calendar math) and must NOT be wrapped in `jit`; encode on the host,
then feed the resulting SDRs to the jitted step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScalarEncoder:
    """Classic HTM scalar encoder: a contiguous run of `active_bits` ones
    whose position slides linearly with the value over [minimum, maximum]
    (clipped). Overlap between two encodings decays linearly with value
    distance — the HTM similarity contract."""

    minimum: float
    maximum: float
    size: int = 400
    active_bits: int = 21

    @property
    def buckets(self) -> int:
        return self.size - self.active_bits + 1

    def __call__(self, value) -> jnp.ndarray:
        v = jnp.clip(
            (jnp.asarray(value, jnp.float32) - self.minimum)
            / (self.maximum - self.minimum),
            0.0, 1.0,
        )
        start = jnp.round(v * (self.buckets - 1)).astype(jnp.int32)
        i = jnp.arange(self.size, dtype=jnp.int32)
        s = start[..., None]
        return (i >= s) & (i < s + self.active_bits)


@dataclasses.dataclass(frozen=True)
class CyclicEncoder:
    """Scalar encoder on a circle (hour-of-day, day-of-week): the active
    run wraps, so maximum and minimum encode adjacently."""

    period: float
    size: int = 128
    active_bits: int = 11

    def __call__(self, value) -> jnp.ndarray:
        phase = jnp.mod(jnp.asarray(value, jnp.float32), self.period)
        start = jnp.floor(phase / self.period * self.size).astype(jnp.int32)
        i = jnp.arange(self.size, dtype=jnp.int32)
        off = jnp.mod(i - start[..., None], self.size)
        return off < self.active_bits


@dataclasses.dataclass(frozen=True)
class CategoryEncoder:
    """Disjoint one-hot blocks of `active_bits` per category: no overlap
    between distinct categories."""

    categories: int
    active_bits: int = 15

    @property
    def size(self) -> int:
        return self.categories * self.active_bits

    def __call__(self, index) -> jnp.ndarray:
        idx = jnp.asarray(index, jnp.int32)
        i = jnp.arange(self.size, dtype=jnp.int32)
        s = (idx * self.active_bits)[..., None]
        return (i >= s) & (i < s + self.active_bits)


@dataclasses.dataclass(frozen=True)
class DateTimeEncoder:
    """NAB-style timestamp context: cyclic hour-of-day + day-of-week.
    Input is integer seconds-since-epoch (or any consistent origin).

    The phase reduction happens host-side in int64 (exact for any
    timestamp) — reducing current-era epoch values in float32 would
    quantize them to its 128-second ulp, aliasing nearby minutes, and
    int32 would overflow in 2038. Consequence: this encoder needs
    concrete (host) values, not jit tracers — encode timestamps outside
    jit (they come from the data pipeline anyway)."""

    hour_size: int = 128
    hour_bits: int = 11
    weekday_size: int = 64
    weekday_bits: int = 9

    @property
    def size(self) -> int:
        return self.hour_size + self.weekday_size

    def __call__(self, epoch_seconds) -> jnp.ndarray:
        import numpy as np

        t = np.asarray(jax.device_get(epoch_seconds)).astype(np.int64)
        day_phase = jnp.asarray((t % 86400).astype(np.float32))
        week_phase = jnp.asarray((t % (7 * 86400)).astype(np.float32))
        hour = CyclicEncoder(86400.0, self.hour_size,
                             self.hour_bits)(day_phase)
        # epoch day 0 (1970-01-01) was a Thursday; weekday phase only
        # needs consistency, not calendar alignment
        wday = CyclicEncoder(7 * 86400.0, self.weekday_size,
                             self.weekday_bits)(week_phase)
        return jnp.concatenate([hour, wday], axis=-1)


def concat(*sdrs: jnp.ndarray) -> jnp.ndarray:
    """Concatenate encoder outputs into one input SDR."""
    return jnp.concatenate(sdrs, axis=-1)


def anomaly_score(prev_predicted_columns: np.ndarray,
                  active_columns: np.ndarray) -> float:
    """NAB/Numenta raw anomaly score: fraction of currently active
    columns that were NOT predicted by the previous step. The in-step
    `metrics['anomaly']` (bursting / active_columns) is the same
    quantity computed on-device."""
    active = np.asarray(active_columns, bool)
    pred = np.asarray(prev_predicted_columns, bool)
    n_active = active.sum()
    if n_active == 0:
        return 0.0
    return float((active & ~pred).sum() / n_active)
