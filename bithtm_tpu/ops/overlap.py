"""Proximal overlap: the SpatialPooler's hot forward op.

Reference semantics (`projections.py:18-21`): per column, count input
bits that land on connected synapses (permanence >= threshold). That is
an integer matvec of the binary input against the binary connection
matrix — exactly what the MXU wants, as an int8 x int8 -> int32 product.

The connection matrix is cached as int8 in `SPState.connected` (updated
only on the k learning rows per step) so the forward pass never touches
the f32 permanences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def overlaps(connected_i8: jnp.ndarray, input_bits: jnp.ndarray) -> jnp.ndarray:
    """(C, I) int8 connection matrix x (I,) bool input -> (C,) int32.

    Equivalent to `(weight & input).sum(axis=1)` (`projections.py:20`).
    """
    x = input_bits.astype(jnp.int8)
    return jax.lax.dot_general(
        connected_i8,
        x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
