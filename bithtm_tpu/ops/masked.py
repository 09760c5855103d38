"""Static-shape replacements for the reference's ragged-index kernels.

The reference implements ragged scatter/gather bookkeeping on CPU:
`arange_concatenated` (`utils.py:13-25`), `nonzero_bounded_2d`
(`utils.py:27-42`) and `replace_free` (`utils.py:44-76`), all in service
of growing a ragged synapse graph. Under XLA everything must be static
shape, so those become:

  * ``compact_mask`` — turn a boolean mask into a fixed-width ascending
    index list (the jit-safe analogue of ``np.where``).
  * ``slot_fill`` — scatter the i-th selected source into the i-th free
    slot of each row (the analogue of ``replace_free``: same
    fill-in-order semantics, with overflow *dropped and counted* instead
    of triggering a reallocation).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_or(values: jnp.ndarray, idx: jnp.ndarray, fill):
    """`values[idx]` with *any* out-of-range index (negative sentinels
    included) yielding `fill`. Plain `jnp.take(mode="fill")` only fills
    for indices beyond the upper bound — negatives wrap."""
    taken = jnp.take(values, idx, mode="fill", fill_value=fill)
    return jnp.where(idx >= 0, taken, fill)


def compact_mask(mask: jnp.ndarray, size: int, fill_value: int):
    """Indices of True entries of a 1-D mask, ascending, padded to `size`.

    Returns (indices, valid): ``indices[i]`` is the i-th True position or
    ``fill_value`` past the end; ``valid[i]`` marks real entries. Entries
    beyond `size` are dropped (callers account for this via metrics).
    """
    idx = jnp.nonzero(mask, size=size, fill_value=fill_value)[0]
    valid = idx != fill_value
    return idx.astype(jnp.int32), valid


def rank_in_mask(mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Rank of each True element among the True elements along `axis`
    (0-based, ascending index order). Values at False positions are
    meaningless and must be masked by the caller."""
    return jnp.cumsum(mask.astype(jnp.int32), axis=axis) - 1


def slot_fill(
    dest: jnp.ndarray,       # (R, K) current row contents
    free: jnp.ndarray,       # (R, K) bool: writable slots
    src: jnp.ndarray,        # (R, W) candidate values per row
    chosen: jnp.ndarray,     # (R, W) bool: which candidates to write
    fill_dtype_min=None,
):
    """Write the r-th chosen candidate (ascending candidate index) of each
    row into the r-th free slot (ascending slot index).

    Mirrors `replace_free` (`utils.py:44-76`) minus the residue path: the
    reference returns leftover sources so `DynamicArray2D` can grow; here
    overflow candidates are dropped and returned as a per-row count.

    Returns (new_dest, wrote_mask, overflow_count).
    """
    R, K = dest.shape
    W = src.shape[1]
    free_rank = rank_in_mask(free, axis=1)            # (R, K)
    chosen_rank = rank_in_mask(chosen, axis=1)        # (R, W)
    n_chosen = chosen_rank[:, -1] + 1                 # (R,) == chosen.sum(1)
    n_free = jnp.sum(free, axis=1)

    # cand_by_rank[r, j] = value of the candidate with rank j in row r.
    row_ids = jnp.broadcast_to(jnp.arange(R)[:, None], (R, W))
    scatter_col = jnp.where(chosen, chosen_rank, W)   # W = out-of-bounds drop
    cand_by_rank = jnp.zeros((R, W), src.dtype).at[row_ids, scatter_col].set(
        src, mode="drop"
    )

    wrote = free & (free_rank < n_chosen[:, None])
    gathered = jnp.take_along_axis(
        cand_by_rank, jnp.clip(free_rank, 0, W - 1), axis=1
    )
    new_dest = jnp.where(wrote, gathered, dest)
    overflow = jnp.maximum(chosen.sum(axis=1) - n_free, 0)
    return new_dest, wrote, overflow
