"""Unit tests for the static-shape ragged-op replacements
(`bithtm_tpu/ops/masked.py`, `ops/growth.py`) against straightforward
NumPy models of the reference semantics (`utils.py:13-76`,
`projections.py:79-95`)."""

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu.ops.growth import allocate_segments
from bithtm_tpu.ops.masked import compact_mask, rank_in_mask, slot_fill


def test_compact_mask_basic():
    mask = jnp.asarray([0, 1, 1, 0, 1, 0, 0, 1], bool)
    idx, valid = compact_mask(mask, 6, 99)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4, 7, 99, 99])
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True, True, True, True, False, False])


def test_compact_mask_overflow_keeps_lowest():
    mask = jnp.ones(10, bool)
    idx, valid = compact_mask(mask, 4, 10)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
    assert np.asarray(valid).all()


def test_rank_in_mask():
    m = jnp.asarray([[1, 0, 1, 1], [0, 0, 0, 1]], bool)
    r = np.asarray(rank_in_mask(m))
    assert r[0, 0] == 0 and r[0, 2] == 1 and r[0, 3] == 2
    assert r[1, 3] == 0


def test_slot_fill_fills_in_order():
    dest = jnp.asarray([[-1, 5, -1, -1], [7, 8, -1, 9]], jnp.int32)
    free = dest < 0
    src = jnp.asarray([[10, 11, 12], [20, 21, 22]], jnp.int32)
    chosen = jnp.asarray([[1, 0, 1], [1, 1, 1]], bool)
    new, wrote, overflow = slot_fill(dest, free, src, chosen)
    # row 0: candidates 10, 12 into slots 0, 2
    np.testing.assert_array_equal(np.asarray(new)[0], [10, 5, 12, -1])
    # row 1: one free slot, three candidates -> 20 lands, 2 overflow
    np.testing.assert_array_equal(np.asarray(new)[1], [7, 8, 20, 9])
    np.testing.assert_array_equal(np.asarray(overflow), [0, 2])


def test_slot_fill_no_chosen():
    dest = jnp.full((1, 3), -1, jnp.int32)
    new, wrote, overflow = slot_fill(
        dest, dest < 0, jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2), bool)
    )
    np.testing.assert_array_equal(np.asarray(new), dest)
    assert not np.asarray(wrote).any()


def test_allocate_segments_recycle_before_grow():
    # slots 0..5; owners: 0,1 allocated; counts: slot1 has few synapses
    N = 100
    owner = jnp.asarray([3, 7, N, N, N, N], jnp.int32)
    syn_count = jnp.asarray([20, 2, 0, 0, 0, 0], jnp.int32)
    cells, valid = jnp.asarray([11, 12, 13], jnp.int32), jnp.ones(3, bool)
    slots, ok = allocate_segments(owner, syn_count, cells, valid, 15, N)
    # slot 1 (allocated, recyclable) first, then fresh slots 2, 3
    np.testing.assert_array_equal(np.asarray(slots), [1, 2, 3])
    assert np.asarray(ok).all()


def test_allocate_segments_pool_exhausted():
    N = 10
    owner = jnp.asarray([0, 1], jnp.int32)
    syn_count = jnp.asarray([20, 20], jnp.int32)  # nothing eligible
    cells, valid = jnp.asarray([5], jnp.int32), jnp.ones(1, bool)
    slots, ok = allocate_segments(owner, syn_count, cells, valid, 15, N)
    assert not np.asarray(ok).any()
    assert np.asarray(slots)[0] == 2  # S = drop sentinel
