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
                  punishment: float, perm_threshold: float,
                  synapses: int):
    """Fused per-tile: punishment decrement + synapse death + active-set
    compare + connected-compare — one HBM read and one write of the
    synapse tables per step instead of separate punish and activation
    passes. Activity and connected-activity are emitted as **bf16 0/1**:
    they are consumed only as MXU operands of the per-segment count
    dots, and emitting the MXU-native dtype here deletes ~2.5 ms/step of
    table-sized pred->s32 convert + re-compare passes XLA otherwise
    materializes between the kernel and the dots (measured, B=256).
    (The counts and prediction stay outside: in-kernel G-axis reductions
    measured slower than XLA's dots.)

    The punished-segment mask arrives as ONE i32 word per column (bit g
    = segment g punished) instead of a pre-broadcast (C, J) mask: the
    XLA-side `seg_broadcast` MXU dot materialized a table-sized s32
    intermediate (~1 ms/step at B=256) that this per-lane bit extract
    replaces for free."""
    syn = syn_ref[:]
    perm = perm_ref[:]
    live = syn >= 0
    # act_prev is bf16 0/1; one bf16 `!= 0` is fine, but a SECOND bf16
    # operand compared `!= 0` here trips a Mosaic i1-relayout bug — the
    # punishment mask therefore rides as an integer bit word. The word
    # is carried as u8 when G <= 8 (an s32 (C, 1) operand lane-pads to
    # 128 and relayout-copies ~0.4 ms/step at B=256; u8 pads 4x less).
    g_lane = jax.lax.broadcasted_iota(jnp.int32, syn.shape, 1) // synapses
    pen_bit = (pun_ref[:].astype(jnp.int32) >> g_lane) & 1
    pen = (pen_bit == 1) & (actprev_ref[:] != 0) & live
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
    pun_word,                # (C,) int32 punished-segment bitmask (bit g)
    cols,                    # (A,) int32
    bits,                    # (A, W) uint32
    cell_dim: int,
    synapses: int,
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
        synapses=synapses,
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
            big(), big(), big(),
            pl.BlockSpec((block, 1), tile, memory_space=pltpu.VMEM),
        ],
        out_specs=(big(), big(), big(), big()),
        # update the synapse tables in place (operands 2, 3 -> outputs
        # 0, 1): saves XLA the defensive operand copies
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(cols.reshape(1, A), bits, syn_cell, syn_perm,
      act_prev.astype(jnp.bfloat16),
      pun_word.reshape(C, 1).astype(
          jnp.uint8 if J // synapses <= 8 else jnp.int32
      ))


def _sp_kernel(cols_ref, delta_ref, perm_ref, perm_out,
               pack_out, *, threshold, lo, hi, words: int,
               num_active: int, block: int):
    """Fused SP learning pass, one HBM round trip: masked Hebbian
    update (+ saturating clip on the int16 path) + re-derivation of the
    bit-packed connected matrix (`pack_input`'s strided mapping: bit j
    of word w = input j*S + w, S = words — the 8 slice reads are
    128-aligned because `overlap.input_words` rounds S up to 128).

    Replaces the XLA pipeline that materialized a (C, I) pred compare
    tensor between the update and its two consumers (state + pack),
    ~1.4 ms/step at B=256 (docs/PERFORMANCE.md). The round-2 probe of
    this fusion lost to XLA because it widened the whole table to s32
    in-kernel; this version keeps the update arithmetic in the native
    table dtype and only converts the (block, S) slices for the pack
    compare."""
    # The active-column flag is derived IN-KERNEL from the top-k column
    # list (SMEM) against program_id-based row indices: any (C, 1)
    # operand — mask or constant iota — lane-pads to 128 and
    # relayout-copies every step under vmap (~0.4 ms/step at B=256,
    # measured), and a (block, 1) i1 mask broadcast across lanes trips
    # a Mosaic relayout error — so the flag becomes a 0/1 VALUE built
    # from A narrow compares and enters the update as a broadcast
    # multiply. On the int16 path ALL arithmetic runs widened to i32
    # (Mosaic on this target legalizes i16 add/mul but not i16 compare
    # or min/max); only the HBM load/store stay s16 — the bandwidth,
    # not the VPU, is the bottleneck here.
    row = pl.program_id(0) * block + jax.lax.broadcasted_iota(
        jnp.int32, (block, 1), 0
    )                                            # (block, 1) i32
    act = jnp.zeros(row.shape, jnp.int32)
    for a in range(num_active):
        act = jnp.where(row == cols_ref[0, a], 1, act)
    d = act.astype(delta_ref.dtype) * delta_ref[:]  # (block, I_pad)
    if lo is not None:
        p = perm_ref[:].astype(jnp.int32) + d
        p = jnp.clip(p, lo, hi)
        perm_out[:] = p.astype(jnp.int16)
    else:
        p = perm_ref[:] + d
        perm_out[:] = p
    S = words
    acc = jnp.zeros((p.shape[0], S), jnp.int32)
    for j in range(8):
        sl = p[:, j * S:(j + 1) * S]
        acc = acc | jnp.where(sl >= threshold, 1 << j, 0)
    pack_out[:] = acc.astype(jnp.uint8)


def sp_update_pack_tpu(
    permanence,              # (C, I_pad) int16 units or float32
    delta_row,               # (I_pad,) per-input Hebbian delta,
                             #   0 beyond the logical input_dim
    active_cols,             # (A,) int32 the top-k active columns
    threshold,               # connected threshold (units or f32)
    quantized: bool,
    block: int = 256,
    interpret: bool = False,
):
    """Returns (permanence', connected_packed u8). In-place on the
    permanence table (aliased). Bit-identical to the XLA fallback in
    `models/spatial_pooler.sp_step`."""
    C, I_pad = permanence.shape
    S = I_pad // 8
    A = active_cols.shape[0]
    block = min(block, C)
    assert C % block == 0 and I_pad % 8 == 0 and S % 128 == 0, (
        C, block, I_pad)

    if quantized:
        lo, hi = -32000, 32000
        thr = int(threshold)
        op_dtype = jnp.int32
    else:
        lo = hi = None
        thr = float(threshold)
        op_dtype = permanence.dtype
    kernel = functools.partial(
        _sp_kernel, threshold=thr, lo=lo, hi=hi, words=S, num_active=A,
        block=block,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, I_pad), permanence.dtype),
            jax.ShapeDtypeStruct((C, S), jnp.uint8),
        ),
        grid=(C // block,),
        in_specs=[
            pl.BlockSpec((1, A), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, I_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, I_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, I_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(active_cols.reshape(1, A).astype(jnp.int32),
      delta_row.reshape(1, I_pad).astype(op_dtype), permanence)


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
