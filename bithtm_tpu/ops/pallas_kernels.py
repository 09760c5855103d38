"""Pallas TPU kernels for the hot full-table ops.

The one op XLA cannot schedule well here is the active-set compare
(`active_set.synapse_activation`): the natural HLO decomposition
materializes the derived column-id table and the matched-bitmask table
(two extra full-size HBM round trips, ~1.2 GB/step at batch 128). The
Pallas version streams one (block, J) tile of the synapse table through
VMEM, loops the A active columns from SMEM, and writes only the boolean
activity mask — HBM traffic drops to read-syn + write-act.

CPU (tests) uses the pure-XLA fallback in `active_set.py`; kernel
parity against that fallback is tested in interpret mode
(`tests/test_pallas.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_bits(cols_ref, bits_ref, col, lo, num_active: int, words: int):
    """OR-accumulate the matched column's bitmask word per element.

    The A-loop is the kernel's VPU cost center (A x J x C compares).
    For multi-word masks (cell_dim > 32) the per-element word choice
    ``w_idx`` is hoisted OUT of the A loop: the per-a body is then one
    compare + (W-1) scalar-pair selects + masked-or, ~4 ops at W=2
    instead of ~7 with the word test inside (measured 1.35x end-to-end
    on the 16K x 64 scaled config, where A=328 makes this loop 86% of
    the step)."""
    matched = jnp.zeros(col.shape, jnp.uint32)
    if words > 1:
        w_idx = lo // 32
        sels = [w_idx == w for w in range(1, words)]  # per-element, once
    for a in range(num_active):       # static unroll: A independent
        c = cols_ref[0, a]            # compare+select chains pipeline
        if words == 1:
            chosen = bits_ref[a, 0]
        else:
            chosen = jnp.full(col.shape, bits_ref[a, 0], jnp.uint32)
            for w in range(1, words):
                chosen = jnp.where(sels[w - 1], bits_ref[a, w], chosen)
        matched |= jnp.where(col == c, chosen, jnp.uint32(0))
    return matched


def _act_kernel(cols_ref, bits_ref, syn_ref, act_ref, *, cell_dim: int,
                num_active: int, words: int):
    syn = syn_ref[:]                                  # (Cb, J) int32
    col = syn // cell_dim                             # -1 for free slots
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _match_bits(cols_ref, bits_ref, col, lo, num_active, words)
    act = ((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)
    act_ref[:] = act.astype(jnp.bfloat16)  # MXU operand of the count dots


def _act_conn_kernel(cols_ref, bits_ref, syn_ref, perm_ref, act_ref,
                     conn_ref, *, cell_dim: int, num_active: int,
                     words: int, perm_threshold: float):
    """Inference-path variant: activation AND connected-activity in one
    pass (the frozen table is read-only, so unlike `_table_kernel` it
    writes no syn/perm back — the connected compare otherwise costs a
    separate XLA pass re-reading the f32 permanence table)."""
    syn = syn_ref[:]
    col = syn // cell_dim
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _match_bits(cols_ref, bits_ref, col, lo, num_active, words)
    act = ((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)
    act_ref[:] = act.astype(jnp.bfloat16)
    conn_ref[:] = (act & (perm_ref[:] >= perm_threshold)).astype(
        jnp.bfloat16
    )


def _table_kernel(cols_ref, bits_ref, syn_ref, perm_ref, actprev_ref,
                  pun_ref, syn_out, perm_out, act_out, conn_out, *,
                  cell_dim: int, num_active: int, words: int,
                  punishment: float, perm_threshold: float):
    """Fused per-tile: punishment decrement + synapse death + active-set
    compare + connected-compare — one HBM read and one write of the
    synapse tables per step instead of separate punish and activation
    passes. Activity and connected-activity are emitted as **bf16 0/1**:
    they are consumed only as MXU operands of the per-segment count
    dots, and emitting the MXU-native dtype here deletes ~2.5 ms/step of
    table-sized pred->s32 convert + re-compare passes XLA otherwise
    materializes between the kernel and the dots (measured, B=256).
    (The counts and prediction stay outside: in-kernel G-axis reductions
    measured slower than XLA's dots.)"""
    syn = syn_ref[:]
    perm = perm_ref[:]
    live = syn >= 0
    # pun arrives as bool; act_prev as bf16 0/1. One bf16 `!= 0` is
    # fine, but a second bf16 operand compared `!= 0` here trips a
    # Mosaic i1-relayout bug — keep pun boolean at the kernel boundary.
    pen = pun_ref[:] & (actprev_ref[:] != 0) & live
    perm = perm - jnp.where(pen, jnp.float32(punishment), jnp.float32(0.0))
    dead = live & (perm < 0.0)
    syn = jnp.where(dead, -1, syn)
    perm = jnp.where(dead, jnp.float32(-1.0), perm)

    col = syn // cell_dim
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _match_bits(cols_ref, bits_ref, col, lo, num_active, words)
    act = ((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)
    syn_out[:] = syn
    perm_out[:] = perm
    act_out[:] = act.astype(jnp.bfloat16)
    conn_out[:] = (act & (perm >= perm_threshold)).astype(jnp.bfloat16)


def table_update_tpu(
    syn_cell,                # (C, J) int32
    syn_perm,                # (C, J) float32
    act_prev,                # (C, J) bf16 0/1
    pun_flat,                # (C, J) bool/int8 punished-segment mask
    cols,                    # (A,) int32
    bits,                    # (A, W) uint32
    cell_dim: int,
    punishment: float,
    perm_threshold: float,
    block: int = 128,
    interpret: bool = False,
):
    """Returns (syn', perm', act_now bf16, conn_now bf16) — the fused
    punish/death/activation/connected table pass, updating the synapse
    tables in place."""
    C, J = syn_cell.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    kernel = functools.partial(
        _table_kernel, cell_dim=cell_dim, num_active=A, words=W,
        punishment=punishment, perm_threshold=perm_threshold,
    )
    tile = lambda i: (i, 0)
    big = lambda: pl.BlockSpec((block, J), tile, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, J), jnp.int32),
            jax.ShapeDtypeStruct((C, J), jnp.float32),
            jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
            jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
        ),
        grid=(C // block,),
        in_specs=[
            pl.BlockSpec((1, A), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((A, W), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            big(), big(), big(), big(),
        ],
        out_specs=(big(), big(), big(), big()),
        # update the synapse tables in place (operands 2, 3 -> outputs
        # 0, 1): saves XLA the defensive operand copies
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(cols.reshape(1, A), bits, syn_cell, syn_perm,
      act_prev.astype(jnp.bfloat16), pun_flat.astype(jnp.bool_))


def synapse_activation_tpu(
    syn_cell: jnp.ndarray,   # (C, J) int32
    cols: jnp.ndarray,       # (A,) int32
    bits: jnp.ndarray,       # (A, W) uint32
    cell_dim: int,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TPU version of `active_set.synapse_activation` (identical
    semantics, single HBM pass; bf16 0/1 output — the count dots' MXU
    operand dtype)."""
    C, J = syn_cell.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    kernel = functools.partial(
        _act_kernel, cell_dim=cell_dim, num_active=A, words=W
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
        grid=(C // block,),
        in_specs=[
            pl.BlockSpec((1, A), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((A, W), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, J), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, J), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cols.reshape(1, A), bits, syn_cell)


def synapse_activation_conn_tpu(
    syn_cell: jnp.ndarray,   # (C, J) int32
    syn_perm: jnp.ndarray,   # (C, J) float32
    cols: jnp.ndarray,       # (A,) int32
    bits: jnp.ndarray,       # (A, W) uint32
    cell_dim: int,
    perm_threshold: float,
    block: int = 256,
    interpret: bool = False,
):
    """Fused activation + connected-activity over a frozen table (the
    inference forward pass). Returns (act bf16, conn bf16)."""
    C, J = syn_cell.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    kernel = functools.partial(
        _act_conn_kernel, cell_dim=cell_dim, num_active=A, words=W,
        perm_threshold=perm_threshold,
    )
    big = lambda: pl.BlockSpec((block, J), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
            jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
        ),
        grid=(C // block,),
        in_specs=[
            pl.BlockSpec((1, A), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((A, W), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            big(), big(),
        ],
        out_specs=(big(), big()),
        interpret=interpret,
    )(cols.reshape(1, A), bits, syn_cell, syn_perm)
