"""Proximal overlap: the SpatialPooler's hot forward op.

Reference semantics (`projections.py:18-21`): per column, count input
bits that land on connected synapses (permanence >= threshold).

TPU form: the connection matrix is binary, so it is cached **bit-packed
as uint8** (`SPState.connected`, (C, ceil(I/8))) and the overlap is a
popcount of the AND with the packed input — 1/8th the HBM traffic of an
int8 matrix (the int8 matvec is bandwidth-bound: each stream has its
own connection matrix, so the MXU gets no operand reuse).

uint8 words, not uint32: when ``I % 8 == 0`` the pack is a free
row-major reshape ``(C, I) -> (C, I/8, 8)`` + an 8-wide minor reduce,
which XLA fuses straight into the permanence-update pass — no padded
boolean intermediate is ever materialized (measured: the u32 variant
cost a 0.5 GB pred materialization + pad per step at batch 256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def input_words(input_dim: int) -> int:
    """uint8 words per packed input row."""
    return (input_dim + 7) // 8


def pack_input(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., I) bool -> (..., ceil(I/8)) uint8 (bit i of word i//8).

    Fast path (I divisible by 8): pure reshape + 8-wide reduce, fusible
    into the producer of ``bits``. Otherwise pads the minor axis first.
    """
    I = bits.shape[-1]
    Iw = input_words(I)
    pad = Iw * 8 - I
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((*bits.shape[:-1], pad), bits.dtype)], axis=-1
        )
    m = bits.reshape(*bits.shape[:-1], Iw, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (m * weights).sum(axis=-1, dtype=jnp.uint8)


def unpack_connected(words: jnp.ndarray, input_dim: int) -> jnp.ndarray:
    """(..., Iw) uint8 -> (..., I) bool (inverse of `pack_input`)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    expanded = (words[..., None] >> shifts) & jnp.uint8(1)
    flat = expanded.reshape(*words.shape[:-1], words.shape[-1] * 8)
    return flat[..., :input_dim].astype(jnp.bool_)


def overlaps(connected_bits: jnp.ndarray,
             input_bits: jnp.ndarray) -> jnp.ndarray:
    """(C, Iw) uint8 packed connection matrix x (I,) bool input ->
    (C,) int32 overlap counts.

    Equivalent to `(weight & input).sum(axis=1)` (`projections.py:20`).
    """
    x = pack_input(input_bits)                      # (Iw,)
    anded = connected_bits & x
    return jax.lax.population_count(anded).astype(jnp.int32).sum(
        axis=-1, dtype=jnp.int32
    )
