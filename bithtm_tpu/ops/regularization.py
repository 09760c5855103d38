"""Boosting and global inhibition as pure functions.

Reference: `regularizations.py:4-29`. Both are trivially fusable
elementwise/top-k ops; XLA fuses the boost factor into the overlap
epilogue so they never round-trip HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def boost_factor(duty_cycle: jnp.ndarray, intensity: float, density: float):
    """factor = exp(-(intensity / density) * duty_cycle)
    (`regularizations.py:16`)."""
    return jnp.exp(-(intensity / density) * duty_cycle)


def boost(overlaps: jnp.ndarray, duty_cycle: jnp.ndarray, intensity: float,
          density: float) -> jnp.ndarray:
    """Boosted overlaps (`regularizations.py:15-17`)."""
    return boost_factor(duty_cycle, intensity, density) * overlaps.astype(
        jnp.float32
    )


def duty_cycle_update(duty_cycle: jnp.ndarray, active_mask: jnp.ndarray,
                      momentum: float) -> jnp.ndarray:
    """EMA of activity (`regularizations.py:19-21`). The reference updates
    this every step regardless of the learning flag (`networks.py:33`)."""
    return duty_cycle * momentum + active_mask.astype(jnp.float32) * (
        1.0 - momentum
    )


def k_winners(boosted: jnp.ndarray, k: int):
    """Global inhibition: exact top-k (`regularizations.py:28-29`).

    The reference uses `np.argpartition` (unordered, arbitrary ties);
    downstream treats the result as a set, so `lax.top_k` (ties broken by
    lowest index) is behaviour-compatible. Returns (indices, mask).
    """
    _, idx = jax.lax.top_k(boosted, k)
    # mask build dispatches on shape (see `column_mask_from_cols`):
    # compare-any fuses into the duty-cycle consumer at small C x k,
    # the index scatter wins ~6x at the 16K x A=328 geometry.
    from .active_set import column_mask_from_cols

    mask = column_mask_from_cols(idx.astype(jnp.int32),
                                 boosted.shape[-1])
    return idx, mask
