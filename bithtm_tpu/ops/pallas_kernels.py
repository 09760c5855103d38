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


BISECT_MIN_ACTIVE = 64  # measured crossover: the 7-gather bisection
# beats the unrolled chain once A exceeds ~60 compares (chain cost is
# linear in A, bisection is ~constant); below it the chain pipelines
# better. See docs/PERFORMANCE.md "Sub-O(A) membership".
_BISECT_SENTINEL = 2**30

HASH_MAX_ACTIVE = 48  # below this, the salted-hash matcher (ONE
# multiplicative hash + 2 bucket probes) replaces the A-compare chain:
# ~2*(1+W) lane-gathers per element instead of A compare/selects. The
# salt search guarantees every bucket holds <= CAP entries (zero
# spill — the 4-wide overflow compare chain this replaced cost ~12
# VPU ops per element for entries that almost never existed); past
# ~48 the zero-spill condition starts costing retries, and by A=64
# bisection wins anyway.
_HASH_CAP = 2      # table slots per bucket
_HASH_SALT0 = 0x9E3779B9 - 2**32  # golden-ratio seed (as i32);
_HASH_STEP = 0x61C88647           # stepped by an odd constant


def bisect_tables(cols, bits):
    """Lay the active set out for the in-kernel bisection matcher.

    Sorts (cols, bits) by column id and packs them into one
    (Rpad, 128) i32 gather table of L*(1+W) rows (sublane-padded to 8):

      row l          lane b   = sorted_col[b*L + l]   (l in [0, L))
      row L*(1+w)+l  lane b   = bitmask word w of that entry

    L = ceil(A / 128) "probes per bucket"; row 0 doubles as the
    bisection boundary list (boundary[b] = sorted_col[b*L]). Padding
    entries get a sentinel column id no real column reaches, so they
    never match. Bit words ride as i32 (same bits; the kernel's
    shift-and-mask extract is sign-safe)."""
    A, W = bits.shape
    L = (A + 127) // 128
    P = L * 128
    ops = [cols.astype(jnp.int32)] + [bits[:, w].astype(jnp.uint32)
                                      for w in range(W)]
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    sc = jnp.concatenate([
        sorted_ops[0],
        jnp.full((P - A,), _BISECT_SENTINEL, jnp.int32),
    ])
    rows = [sc.reshape(128, L).T]
    for w in range(W):
        sw = jnp.concatenate([
            sorted_ops[1 + w].astype(jnp.int32),
            jnp.zeros((P - A,), jnp.int32),
        ])
        rows.append(sw.reshape(128, L).T)
    tab = jnp.concatenate(rows, axis=0)
    R = tab.shape[0]
    rpad = -R % 8
    if rpad:
        tab = jnp.concatenate(
            [tab, jnp.zeros((rpad, 128), jnp.int32)], axis=0)
    return tab, L


def _hash7(x, salt):
    """The in-kernel bucket hash: top 7 bits of the wrapping i32
    multiplicative hash. Arithmetic shift + mask extracts bits 25-31
    regardless of sign; i32 wraparound multiply has the same low-word
    bits as the u32 multiply, so build side and kernel side agree."""
    return (x * salt >> 25) & 127


_HASH_MAX_TRIES = 4096   # salt-search batch-iteration bound (hash_salt)
_HASH_SALT_BATCH = 16    # candidate salts evaluated per iteration


def hash_salt(cols):
    """Find a salt under which the A active columns hash into 128
    buckets with at most `_HASH_CAP` entries per bucket — ZERO spill,
    so the in-kernel matcher needs no overflow chain at all. Expected
    ~2 tries at A=41 / ~2.7 at A=47 (per-try success is
    exp(-C(A,3)/128^2), the Poisson estimate of no bucket reaching 3;
    the whole search is A x 128 compares per try — noise); returns the
    i32 salt.

    The search evaluates `_HASH_SALT_BATCH` candidate salts per
    while-loop iteration in ONE vectorized pass and takes the first
    zero-spill one. This matters under vmap: a batched while_loop runs
    until EVERY stream's condition clears, i.e. the max iteration count
    over the batch — with per-salt success ~0.4-0.5 at A<=47, a
    one-salt-per-iteration loop runs ~9 masked iterations at B=256
    (measured as a serving regression), while a 16-salt batch clears
    all streams in 1 iteration with probability ~1 - B * 0.6^16.

    The search is bounded at `_HASH_MAX_TRIES` batches so a
    pathological active set can never hang the dispatch: successive
    odd salts stepped by the golden-ratio constant behave as
    independent draws for any fixed column set — multiplicative
    hashing has no column structure that survives the whole orbit —
    so P(no zero-spill salt in 4096*16 tries) is astronomically small
    for every A <= 47. If the bound is ever hit anyway, the salt with
    the smallest overflow seen is returned; `hash_tables` then drops
    the spilled entries (a correctness loss surfaced only in that
    astronomically unlikely branch, never a hang)."""
    cols = cols.astype(jnp.int32)
    b = jnp.arange(128, dtype=jnp.int32)
    n = jnp.arange(_HASH_SALT_BATCH, dtype=jnp.int32)
    big = jnp.int32(2**30)

    def batch_best(salt0):
        """(first zero-spill salt in the batch or salt of min overflow,
        its overflow) — one vectorized pass over the candidate batch."""
        salts = (salt0 + n * jnp.int32(_HASH_STEP)) | jnp.int32(1)
        h = _hash7(cols[None, :], salts[:, None])        # (N, A)
        occ = jnp.sum(h[:, None, :] == b[None, :, None], axis=-1,
                      dtype=jnp.int32)                   # (N, 128)
        ovf = jnp.maximum(occ - _HASH_CAP, 0).sum(
            axis=-1, dtype=jnp.int32)                    # (N,)
        # first index with zero overflow, else the argmin of overflow;
        # bias the key by index so ties pick the earliest salt
        key = ovf * jnp.int32(_HASH_SALT_BATCH) + n
        idx = jnp.argmin(key)
        return salts[idx], ovf[idx]

    def cond(carry):
        _, tries, _, best_ovf = carry
        return (best_ovf > 0) & (tries < _HASH_MAX_TRIES)

    def body(carry):
        salt0, tries, best_salt, best_ovf = carry
        s, o = batch_best(salt0)
        better = o < best_ovf
        best_salt = jnp.where(better, s, best_salt)
        best_ovf = jnp.where(better, o, best_ovf)
        nxt = salt0 + jnp.int32(_HASH_SALT_BATCH) * jnp.int32(_HASH_STEP)
        return nxt, tries + 1, best_salt, best_ovf

    salt0 = jnp.int32(_HASH_SALT0) | 1
    _, _, best_salt, _ = jax.lax.while_loop(
        cond, body, (salt0, jnp.int32(0), salt0, big)
    )
    return best_salt


def hash_tables(cols, bits):
    """Lay the active set out for the in-kernel salted-hash matcher.

    Returns (tab (R8, 128) i32, salt (1, 1) i32):

      tab row s*(1+W)     lane b = column id of slot s of bucket b
      tab row s*(1+W)+1+w lane b = bitmask word w of that entry

    for s in [0, CAP). Entries are assigned to slots in ascending
    active-list order; the salt search guarantees zero spill (every
    bucket holds <= CAP entries), so there is no overflow chain. Empty
    lanes hold a sentinel no real column reaches."""
    A, W = bits.shape
    cols = cols.astype(jnp.int32)
    salt = hash_salt(cols)
    h = _hash7(cols, salt)                                   # (A,)
    a = jnp.arange(A, dtype=jnp.int32)
    rank = jnp.sum(
        (h[None, :] == h[:, None]) & (a[None, :] < a[:, None]),
        axis=-1, dtype=jnp.int32,
    )                                                        # (A,)
    lane = jnp.arange(128, dtype=jnp.int32)
    rows = []
    for s in range(_HASH_CAP):
        sel = (h[:, None] == lane) & (rank[:, None] == s)    # (A, 128)
        ent = jnp.sum(sel * cols[:, None], axis=0, dtype=jnp.int32)
        ent = jnp.where(sel.any(axis=0), ent, _BISECT_SENTINEL)
        rows.append(ent)
        for w in range(W):
            rows.append(jnp.sum(
                sel * bits[:, w, None].astype(jnp.int32),
                axis=0, dtype=jnp.int32,
            ))
    tab = jnp.stack(rows, axis=0)
    R = tab.shape[0]
    rpad = -R % 8
    if rpad:
        tab = jnp.concatenate(
            [tab, jnp.zeros((rpad, 128), jnp.int32)], axis=0)
    return tab, salt.reshape(1, 1)


def _match_bits_hash(tab_ref, salt_ref, col, lo,
                     *, words: int, block: int):
    """Salted-hash form of `_match_bits`: one multiplicative hash picks
    the element's bucket and `_HASH_CAP` probes compare the bucket's
    entries (tpu.dynamic_gather lane lookups, the `_match_bits_bisect`
    idiom). The salt search guarantees zero bucket spill, so there is
    no overflow chain (the 4-wide chain this replaced cost ~12 VPU ops
    per element to compare against entries that almost never existed).
    Per element: CAP*(1+W) gathers + ~10 ops, independent of A — vs A
    compare/selects for the chain."""
    rows = tab_ref[:]
    salt = salt_ref[0, 0]
    J = col.shape[1]
    if words > 1:
        w_idx = lo // 32
    chunks = []
    for c0 in range(0, J, 128):
        colc = col[:, c0:c0 + 128]
        b = _hash7(colc, salt)
        matched = jnp.zeros((block, 128), jnp.int32)
        for s in range(_HASH_CAP):
            base = s * (1 + words)
            ent = jnp.take_along_axis(
                jnp.broadcast_to(rows[base:base + 1, :], (block, 128)),
                b, axis=1)
            m = ent == colc
            word = jnp.take_along_axis(
                jnp.broadcast_to(rows[base + 1:base + 2, :],
                                 (block, 128)),
                b, axis=1)
            for w in range(1, words):
                word2 = jnp.take_along_axis(
                    jnp.broadcast_to(rows[base + 1 + w:base + 2 + w, :],
                                     (block, 128)),
                    b, axis=1)
                word = jnp.where(w_idx[:, c0:c0 + 128] == w, word2, word)
            matched = matched | jnp.where(m, word, 0)
        chunks.append(matched)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks,
                                                             axis=1)
    return out.astype(jnp.uint32)


def _match_bits_bisect(tab_ref, col, lo, *, L: int, words: int,
                       block: int):
    """Bisection form of `_match_bits`: instead of comparing every
    element against all A active columns, binary-search the sorted
    column list with `tpu.dynamic_gather` lane lookups (supported on
    this target for (rows, 128)-shaped operands — hence the 128-lane
    chunking). Per element: 7 boundary gathers + L*(1+W) probe gathers,
    independent of A — measured 2.6x faster than the unrolled chain at
    A=328 (the 16K x 64 scaled config), slower below ~A=64."""
    rows = tab_ref[:]
    J = col.shape[1]
    if words > 1:
        w_idx = lo // 32
    chunks = []
    for c0 in range(0, J, 128):
        colc = col[:, c0:c0 + 128]
        bound = jnp.broadcast_to(rows[0:1, :], (block, 128))
        b = jnp.zeros((block, 128), jnp.int32)
        for s in (64, 32, 16, 8, 4, 2, 1):
            cand = b + s
            v = jnp.take_along_axis(bound, cand, axis=1)
            b = jnp.where(v <= colc, cand, b)
        # (tracking bound[b] through the loop to save the l=0 gather
        # needs a scalar -> 2D initial value: "Broadcast in both
        # sublanes and lanes" is unimplemented in Mosaic — not worth it)
        matched = jnp.zeros((block, 128), jnp.int32)
        for l in range(L):
            ent = jnp.take_along_axis(
                jnp.broadcast_to(rows[l:l + 1, :], (block, 128)),
                b, axis=1)
            m = ent == colc
            word = jnp.take_along_axis(
                jnp.broadcast_to(rows[L + l:L + l + 1, :], (block, 128)),
                b, axis=1)
            for w in range(1, words):
                r = L * (1 + w) + l
                word2 = jnp.take_along_axis(
                    jnp.broadcast_to(rows[r:r + 1, :], (block, 128)),
                    b, axis=1)
                word = jnp.where(w_idx[:, c0:c0 + 128] == w, word2, word)
            matched = matched | jnp.where(m, word, 0)
        chunks.append(matched)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks,
                                                             axis=1)
    return out.astype(jnp.uint32)


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


def _matched_any(match_refs, col, lo, *, num_active: int, words: int,
                 bisect_L: int, hash_match: bool, block: int):
    """Dispatch to the salted-hash matcher (match_refs = (tab, salt),
    small A), the bisection gather (match_refs = (tab,), wins past
    A ~ 64), or the A-compare chain (match_refs = (cols, bits), the
    lane-unfriendly fallback)."""
    if hash_match:
        tab_ref, salt_ref = match_refs
        return _match_bits_hash(tab_ref, salt_ref,
                                col, lo, words=words, block=block)
    if bisect_L:
        (tab_ref,) = match_refs
        return _match_bits_bisect(tab_ref, col, lo, L=bisect_L,
                                  words=words, block=block)
    cols_ref, bits_ref = match_refs
    return _match_bits(cols_ref, bits_ref, col, lo, num_active, words)


def _act_kernel(*refs, cell_dim: int, num_active: int, words: int,
                bisect_L: int, hash_match: bool, block: int):
    *match_refs, syn_ref, act_ref = refs
    syn = syn_ref[:]                                  # (Cb, J) int32
    col = syn // cell_dim                             # -1 for free slots
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _matched_any(match_refs, col, lo, num_active=num_active,
                           words=words, bisect_L=bisect_L,
                           hash_match=hash_match, block=block)
    act = ((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)
    act_ref[:] = act.astype(jnp.bfloat16)  # MXU operand of the count dots


def _pack_v(act, perm, perm_threshold: float, scale: int, dtype):
    """Packed activity value v = act + scale*conn (`active_set.act_scale`);
    built as f32 (or, on the u8 path, i32 — Mosaic legalizes widened
    integer arithmetic + narrow store, the SP-kernel pattern) selects
    then converted to the count dot's operand dtype."""
    if dtype == jnp.uint8:
        one = jnp.int32(1)
        return jnp.where(
            act,
            jnp.where(perm >= perm_threshold, one + scale, one),
            jnp.int32(0),
        ).astype(jnp.uint8)
    one = jnp.float32(1.0)
    return jnp.where(
        act,
        jnp.where(perm >= perm_threshold, one + scale, one),
        jnp.float32(0.0),
    ).astype(dtype)


def _act_conn_kernel(*refs, cell_dim: int, num_active: int,
                     words: int, perm_threshold: float, scale: int,
                     v_dtype, bisect_L: int, hash_match: bool,
                     block: int):
    """Inference-path variant: activation AND connected-activity in one
    pass over the frozen (read-only) table, emitted as ONE packed mask
    (v = act + scale*conn — the separate conn mask cost a second
    table-sized write + count-dot operand). Dead slots are implicit:
    perm < 0 masks the activation (punishment death no longer rewrites
    the syn table, see `_table_kernel`)."""
    *match_refs, syn_ref, perm_ref, v_ref = refs
    syn = syn_ref[:]
    perm = perm_ref[:]
    col = syn // cell_dim
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _matched_any(match_refs, col, lo, num_active=num_active,
                           words=words, bisect_L=bisect_L,
                           hash_match=hash_match, block=block)
    act = (((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)) & (
        perm >= 0.0
    )
    v_ref[:] = _pack_v(act, perm, perm_threshold, scale, v_dtype)


def _table_kernel(*refs, cell_dim: int, num_active: int, words: int,
                  punishment: float, perm_threshold: float,
                  synapses: int, scale: int, v_dtype, bisect_L: int,
                  hash_match: bool, block: int):
    """Fused per-tile: punishment decrement + implicit synapse death +
    active-set compare + connected-compare — one HBM read of the synapse
    tables and one write of the permanences per step instead of separate
    punish and activation passes.

    **Implicit death**: a slot is dead iff perm < 0. The syn table is
    read-only here — rewriting it to -1 on the handful of punish-killed
    slots cost a full-table 4 B/elem write every step; instead the
    `perm >= 0` mask keeps stale targets out of the activation, and the
    learning phase cleans stale slots in row space when it next gathers
    their column (`temporal_memory._learn`).

    Activity + connected-activity are emitted as ONE **packed** value
    (v = act + scale*conn, `active_set.act_scale`) in the count dot's
    MXU operand dtype: one table-sized output + one dot operand instead
    of two of each, decoded exactly outside (`seg_counts_packed`).
    (The counts and prediction stay outside: in-kernel G-axis reductions
    measured slower than XLA's dots.)

    The punished-segment mask arrives as ONE i32 word per column (bit g
    = segment g punished) instead of a pre-broadcast (C, J) mask: the
    XLA-side segment-broadcast MXU dot it replaced materialized a
    table-sized s32 intermediate (~1 ms/step at B=256) that this
    per-lane bit extract provides for free."""
    (*match_refs, syn_ref, perm_ref, actprev_ref, pun_ref,
     perm_out, v_out) = refs
    syn = syn_ref[:]
    perm = perm_ref[:]
    # act_prev is the packed activity; one `!= 0` compare on it is fine,
    # but a SECOND bf16 operand compared `!= 0` here trips a Mosaic
    # i1-relayout bug — the punishment mask therefore rides as an
    # integer bit word. The word is carried as u8 when G <= 8 (an s32
    # (C, 1) operand lane-pads to 128 and relayout-copies ~0.4 ms/step
    # at B=256; u8 pads 4x less). The u8 act_prev compare runs widened
    # to i32 (Mosaic legalizes widened integer arithmetic, the
    # SP-kernel pattern; values are 0/1/1+scale so the convert is
    # exact on the bf16 path too).
    # No explicit live mask: free slots have act_prev == 0 (never
    # punished) and dead/free slots sit at perm < 0, which the
    # activation mask excludes.
    g_lane = jax.lax.broadcasted_iota(jnp.int32, syn.shape, 1) // synapses
    pen_bit = (pun_ref[:].astype(jnp.int32) >> g_lane) & 1
    pen = (pen_bit == 1) & (actprev_ref[:].astype(jnp.int32) != 0)
    perm = perm - jnp.where(pen, jnp.float32(punishment), jnp.float32(0.0))

    col = syn // cell_dim
    lo = syn - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _matched_any(match_refs, col, lo, num_active=num_active,
                           words=words, bisect_L=bisect_L,
                           hash_match=hash_match, block=block)
    act = (((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)) & (
        perm >= 0.0
    )
    perm_out[:] = perm
    v_out[:] = _pack_v(act, perm, perm_threshold, scale, v_dtype)


def _matcher_inputs(cols, bits, J: int):
    """(bisect_L, hash_match, operand list, BlockSpec list) for the
    active-set matcher: the salted-hash table for small A, the
    bisection gather table when A is past the measured crossover (both
    need a 128-chunkable lane axis), else the SMEM cols/bits pair for
    the unrolled chain."""
    A, W = bits.shape
    still = lambda i: (0, 0)
    if A < HASH_MAX_ACTIVE and J % 128 == 0:
        tab, salt = hash_tables(cols, bits)
        specs = [
            pl.BlockSpec(tab.shape, still, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), still, memory_space=pltpu.SMEM),
        ]
        return 0, True, [tab, salt], specs
    if A >= BISECT_MIN_ACTIVE and J % 128 == 0:
        tab, L = bisect_tables(cols, bits)
        R = tab.shape[0]
        spec = pl.BlockSpec((R, 128), still, memory_space=pltpu.VMEM)
        return L, False, [tab], [spec]
    specs = [
        pl.BlockSpec((1, A), still, memory_space=pltpu.SMEM),
        pl.BlockSpec((A, W), still, memory_space=pltpu.SMEM),
    ]
    return 0, False, [cols.reshape(1, A), bits], specs


def table_update_tpu(
    syn_cell,                # (C, J) int32 (read-only: death is implicit)
    syn_perm,                # (C, J) float32
    act_prev,                # (C, J) packed activity (act_scale encoding)
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
    """Returns (perm', act_now packed) — the fused punish/implicit-death/
    activation/connected table pass, updating the permanences in place.
    Decode per-segment counts with `active_set.seg_counts_packed`."""
    from .active_set import act_dtype, act_scale

    C, J = syn_cell.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    bisect_L, hash_match, match_ops, match_specs = _matcher_inputs(
        cols, bits, J)
    n_match = len(match_ops)
    v_dtype = act_dtype(synapses)
    kernel = functools.partial(
        _table_kernel, cell_dim=cell_dim, num_active=A, words=W,
        punishment=punishment, perm_threshold=perm_threshold,
        synapses=synapses, scale=act_scale(synapses), v_dtype=v_dtype,
        bisect_L=bisect_L, hash_match=hash_match, block=block,
    )
    tile = lambda i: (i, 0)
    big = lambda: pl.BlockSpec((block, J), tile, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, J), jnp.float32),
            jax.ShapeDtypeStruct((C, J), v_dtype),
        ),
        grid=(C // block,),
        in_specs=[
            *match_specs,
            big(), big(), big(),
            pl.BlockSpec((block, 1), tile, memory_space=pltpu.VMEM),
        ],
        out_specs=(big(), big()),
        # update the permanence table in place (perm operand ->
        # output 0): saves XLA the defensive operand copy
        input_output_aliases={n_match + 1: 0},
        interpret=interpret,
    )(*match_ops, syn_cell, syn_perm,
      act_prev,
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
    permanence table (aliased). Bit-identical to
    `models/spatial_pooler.sp_step`, which is what production actually
    dispatches: this kernel measured ~4.5 ms/op vs ~4.3 ms for the XLA
    pipeline and was rejected (docs/PERFORMANCE.md "Tried and
    rejected"). Kept, with interpret-mode parity in
    tests/test_pallas.py, as the record of the probe."""
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

    bisect_L, hash_match, match_ops, match_specs = _matcher_inputs(
        cols, bits, J)
    kernel = functools.partial(
        _act_kernel, cell_dim=cell_dim, num_active=A, words=W,
        bisect_L=bisect_L, hash_match=hash_match, block=block,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, J), jnp.bfloat16),
        grid=(C // block,),
        in_specs=[
            *match_specs,
            pl.BlockSpec((block, J), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, J), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*match_ops, syn_cell)


def synapse_activation_conn_tpu(
    syn_cell: jnp.ndarray,   # (C, J) int32
    syn_perm: jnp.ndarray,   # (C, J) float32
    cols: jnp.ndarray,       # (A,) int32
    bits: jnp.ndarray,       # (A, W) uint32
    cell_dim: int,
    perm_threshold: float,
    synapses: int,
    block: int = 256,
    interpret: bool = False,
):
    """Fused activation + connected-activity over a frozen table (the
    inference forward pass). Returns ONE packed activity mask
    (v = act + scale*conn; decode with `active_set.seg_counts_packed`)."""
    from .active_set import act_dtype, act_scale

    C, J = syn_cell.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    bisect_L, hash_match, match_ops, match_specs = _matcher_inputs(
        cols, bits, J)
    v_dtype = act_dtype(synapses)
    kernel = functools.partial(
        _act_conn_kernel, cell_dim=cell_dim, num_active=A, words=W,
        perm_threshold=perm_threshold, scale=act_scale(synapses),
        v_dtype=v_dtype, bisect_L=bisect_L, hash_match=hash_match, block=block,
    )
    big = lambda: pl.BlockSpec((block, J), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, J), v_dtype),
        grid=(C // block,),
        in_specs=[*match_specs, big(), big()],
        out_specs=big(),
        interpret=interpret,
    )(*match_ops, syn_cell, syn_perm)


def _act_frozen_kernel(*refs, cell_dim: int, num_active: int,
                       words: int, scale: int, v_dtype, bisect_L: int,
                       hash_match: bool, block: int):
    """Serving-path variant of `_act_conn_kernel` over a pre-packed
    frozen table: ONE i32 word per slot (cell id in bits 0-23, the
    connected bit — perm >= threshold, precomputed once at freeze time —
    in bit 24, -1 when dead/free). Reads 4 B/slot instead of the
    syn+perm 8 B — the permanence compare is invariant while the graph
    is frozen, so serving need not re-read f32 permanences every step."""
    *match_refs, word_ref, v_ref = refs
    word = word_ref[:]                               # (Cb, J) int32
    live = word >= 0
    cell = word & jnp.int32(0x00FFFFFF)              # 0xFFFFFF when dead
    conn = (word >> jnp.int32(24)) == jnp.int32(1)   # 0 when dead (-1>>24=-1)
    col = cell // cell_dim                           # out-of-range when dead
    lo = cell - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _matched_any(match_refs, col, lo, num_active=num_active,
                           words=words, bisect_L=bisect_L,
                           hash_match=hash_match, block=block)
    act = (((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)) & live
    if v_dtype == jnp.uint8:
        onei = jnp.int32(1)
        v_ref[:] = jnp.where(
            act, jnp.where(conn, onei + scale, onei), jnp.int32(0)
        ).astype(jnp.uint8)
    else:
        one = jnp.float32(1.0)
        v_ref[:] = jnp.where(
            act, jnp.where(conn, one + scale, one), jnp.float32(0.0)
        ).astype(v_dtype)


def synapse_activation_frozen_tpu(
    frozen_word: jnp.ndarray,  # (C, J) int32 packed (see pack_frozen_table)
    cols: jnp.ndarray,         # (A,) int32
    bits: jnp.ndarray,         # (A, W) uint32
    cell_dim: int,
    synapses: int,
    block: int = 256,
    interpret: bool = False,
):
    """Frozen-serving activation + connected-activity: same contract as
    `synapse_activation_conn_tpu` (ONE packed activity mask,
    v = act + scale*conn) but over the 4 B/slot frozen word table."""
    from .active_set import act_dtype, act_scale

    C, J = frozen_word.shape
    A, W = bits.shape
    block = min(block, C)
    assert C % block == 0, (C, block)

    bisect_L, hash_match, match_ops, match_specs = _matcher_inputs(
        cols, bits, J)
    kernel = functools.partial(
        _act_frozen_kernel, cell_dim=cell_dim, num_active=A, words=W,
        scale=act_scale(synapses), v_dtype=act_dtype(synapses),
        bisect_L=bisect_L, hash_match=hash_match, block=block,
    )
    big = lambda: pl.BlockSpec((block, J), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, J), act_dtype(synapses)),
        grid=(C // block,),
        in_specs=[*match_specs, big()],
        out_specs=big(),
        interpret=interpret,
    )(*match_ops, frozen_word)


def _serving_act_kernel(*refs, cell_dim: int, num_active: int,
                        words: int, bisect_L: int, hash_match: bool,
                        block: int):
    """Forward pass over a compact serving table (`ops.serving`): ONE
    i32 word per connected synapse (cell id << 5 | segment g, -1 =
    empty); emits g+1 as uint8 where the presynaptic cell is active,
    else 0 — the per-segment counts then decode from a 1 B/elem read
    outside. The matcher is the same salted-hash / bisection /
    compare-chain dispatch as the learning kernels."""
    *match_refs, word_ref, act_ref = refs
    w = word_ref[:]                                  # (Rb, 128) i32
    g = w & jnp.int32(31)                            # SERVING_G_BITS
    cell = w >> jnp.int32(5)                         # -1 when empty
    col = cell // cell_dim
    lo = cell - col * cell_dim
    bitpos = (lo % 32).astype(jnp.uint32)
    matched = _matched_any(match_refs, col, lo, num_active=num_active,
                           words=words, bisect_L=bisect_L,
                           hash_match=hash_match, block=block)
    act = (((matched >> bitpos) & jnp.uint32(1)) == jnp.uint32(1)) & (
        w >= 0
    )
    act_ref[:] = jnp.where(act, g + 1, 0).astype(jnp.uint8)


def serving_activation_tpu(
    rows: jnp.ndarray,       # (R, 128) int32 packed serving words
    cols: jnp.ndarray,       # (A,) int32
    bits: jnp.ndarray,       # (A, W) uint32
    cell_dim: int,
    block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TPU form of `serving.serving_activation_xla` (identical
    results): one HBM pass over the compact table, 4 B read + 1 B
    written per connected synapse."""
    R = rows.shape[0]
    A, W = bits.shape
    block = min(block, R)
    assert R % block == 0, (R, block)

    bisect_L, hash_match, match_ops, match_specs = _matcher_inputs(
        cols, bits, 128)
    kernel = functools.partial(
        _serving_act_kernel, cell_dim=cell_dim, num_active=A, words=W,
        bisect_L=bisect_L, hash_match=hash_match, block=block,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint8),
        grid=(R // block,),
        in_specs=[
            *match_specs,
            pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*match_ops, rows)


def _small_take_kernel(tab_ref, idx_ref, out_ref, *, chunks: int):
    tab = tab_ref[:]                               # (R8, 128)
    idx = idx_ref[:]                               # (S, 128) int32
    lo = jnp.bitwise_and(idx, 127)
    hi = idx >> 7
    out = jnp.zeros(idx.shape, jnp.int32)
    for c in range(chunks):
        src = jnp.broadcast_to(tab[c:c + 1, :], idx.shape)
        g = jnp.take_along_axis(src, lo, axis=1)
        out = jnp.where(hi == c, g, out)
    out_ref[:] = out


def small_table_take_tpu(
    table: jnp.ndarray,   # (Wc,) int32 — the per-stream lookup table
    idx: jnp.ndarray,     # (S, 128) int32 — indices into the table
    interpret: bool = False,
) -> jnp.ndarray:
    """out[s, l] = table[idx[s, l]], 0 where idx >= ceil(Wc/128)*128.

    The small-table gather XLA cannot do: `take_along_axis` at this
    shape lowers to a scalar-core gather (measured 8x slower than even
    the fused compare-select-reduce it replaces). Here the table rides
    as ceil(Wc/128) sublane rows of a VMEM-resident (R, 128) block and
    each 128-lane index tile does `chunks` tpu.dynamic_gather lane
    lookups + selects — the `_match_bits_bisect` idiom. Used by
    `active_set.take_small_table` for the packed-index growth-key
    decode (idx -> candidate cell) at large-cell-space configs."""
    (Wc,) = table.shape
    S = idx.shape[0]
    assert idx.shape[1] == 128 and S % 8 == 0, idx.shape
    chunks = -(-Wc // 128)
    rpad = -chunks % 8
    tab = jnp.zeros((chunks + rpad, 128), jnp.int32)
    tab = jax.lax.dynamic_update_slice(
        tab.reshape(-1), table.astype(jnp.int32), (0,)
    ).reshape(chunks + rpad, 128)
    kernel = functools.partial(_small_take_kernel, chunks=chunks)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab, idx)
