"""Pallas kernel parity vs the pure-XLA reference path, in interpreter
mode (runs on the CPU test backend; the compiled kernel runs the same
program on real TPU)."""

import jax.numpy as jnp
import numpy as np

from bithtm_tpu.ops.active_set import (
    pack_act_conn,
    pack_bits,
    synapse_activation_xla,
    table_update_xla,
)
from bithtm_tpu.ops.pallas_kernels import (
    synapse_activation_tpu,
    table_update_tpu,
)


def test_synapse_activation_kernel_matches_xla():
    rng = np.random.RandomState(0)
    for D in (4, 32, 40):
        C, G, K, A = 16, 4, 8, 3
        N = C * D
        syn = rng.randint(-1, N, size=(C, G * K)).astype(np.int32)
        cols = np.sort(rng.choice(C, A, replace=False)).astype(np.int32)
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))
        ref = np.asarray(
            synapse_activation_xla(
                jnp.asarray(syn), jnp.asarray(cols), bits, D
            )
        )
        got = np.asarray(
            synapse_activation_tpu(
                jnp.asarray(syn), jnp.asarray(cols), bits, D,
                block=8, interpret=True,
            )
        ) != 0  # kernel emits the bf16 0/1 MXU-operand form
        np.testing.assert_array_equal(got, ref)


def test_table_update_kernel_matches_xla():
    rng = np.random.RandomState(1)
    for D in (4, 40):
        C, G, K, A = 16, 4, 8, 3
        N = C * D
        syn = rng.randint(-1, N, size=(C, G * K)).astype(np.int32)
        perm = np.where(
            syn >= 0, rng.rand(C, G * K).astype(np.float32) * 0.1 - 0.02,
            -1.0,
        ).astype(np.float32)
        act_prev = (rng.rand(C, G * K) < 0.5) & (syn >= 0)
        pun = rng.rand(C, G) < 0.3
        pun_word = (pun.astype(np.int32) << np.arange(G)).sum(
            axis=-1
        ).astype(np.int32)
        seg_cell = rng.randint(0, D + 1, size=(C, G)).astype(np.int32)
        cols = np.sort(rng.choice(C, A, replace=False)).astype(np.int32)
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))
        act_prev_packed = pack_act_conn(
            jnp.asarray(act_prev), jnp.asarray(act_prev & (perm >= 0.05)),
            K,
        )
        ref = table_update_xla(
            jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
            jnp.asarray(pun_word), jnp.asarray(cols), bits,
            jnp.asarray(seg_cell), D, 0.03, 0.05, 2, 1,
        )
        got = table_update_tpu(
            jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
            jnp.asarray(pun_word), jnp.asarray(cols), bits, D, K,
            0.03, 0.05, block=8, interpret=True,
        )
        # kernel covers the fused punish/implicit-death/activation/
        # connected part, returning (perm', packed act) — the counts/
        # prediction tail runs as shared XLA on both paths
        for r, g in zip(ref[:2], got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        # decode sanity on the packed mask: nonzero = active, > 1 = conn
        v = np.asarray(got[1], np.float32)
        perm_new = np.asarray(got[0])
        expect_act = (
            np.asarray(synapse_activation_xla(
                jnp.asarray(syn), jnp.asarray(cols), bits, D))
            & (perm_new >= 0)
        )
        np.testing.assert_array_equal(v != 0, expect_act)
        np.testing.assert_array_equal(
            v > 1, expect_act & (perm_new >= 0.05)
        )


def test_sp_update_pack_kernel_matches_xla():
    """Fused SP update+pack kernel vs the XLA fallback in sp_step, both
    dtypes, interpret mode."""
    from bithtm_tpu.ops.overlap import pack_input
    from bithtm_tpu.ops.pallas_kernels import sp_update_pack_tpu

    rng = np.random.RandomState(3)
    C, I_pad, I = 16, 1024, 1000
    lane = np.arange(I_pad)
    x = rng.rand(I) < 0.3
    cols = np.sort(rng.choice(C, 5, replace=False)).astype(np.int32)
    active = np.isin(np.arange(C), cols)
    for quantized in (True, False):
        if quantized:
            perm = rng.randint(-200, 200, size=(C, I_pad)).astype(np.int16)
            perm[:, I:] = -32000
            delta = np.where(lane < I, np.pad(x, (0, I_pad - I)) * 9 - 3,
                             0).astype(np.int16)
            thr = 0
            ref_perm = np.clip(
                perm.astype(np.int32) + active[:, None] * delta[None, :],
                -32000, 32000,
            ).astype(np.int16)
        else:
            perm = (rng.rand(C, I_pad).astype(np.float32) - 0.5) * 0.2
            perm[:, I:] = -1e9
            delta = np.where(
                lane < I, np.pad(x, (0, I_pad - I)) * 0.045 - 0.015, 0.0
            ).astype(np.float32)
            thr = 0.0
            ref_perm = (
                perm + active[:, None].astype(np.float32) * delta[None, :]
            ).astype(np.float32)
        ref_pack = np.asarray(pack_input(jnp.asarray(ref_perm >= thr)))
        got_perm, got_pack = sp_update_pack_tpu(
            jnp.asarray(perm), jnp.asarray(delta), jnp.asarray(cols),
            thr, quantized, block=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_perm), ref_perm)
        np.testing.assert_array_equal(np.asarray(got_pack), ref_pack)


def test_act_conn_kernel_matches_xla():
    from bithtm_tpu.ops.active_set import synapse_activation_xla
    from bithtm_tpu.ops.pallas_kernels import synapse_activation_conn_tpu

    rng = np.random.RandomState(2)
    for D in (4, 40):
        C, G, K, A = 16, 4, 8, 3
        N = C * D
        syn = rng.randint(-1, N, size=(C, G * K)).astype(np.int32)
        # include stale punishment-death victims (syn >= 0, perm < 0):
        # the implicit-death mask must keep them out of the activation
        perm = np.where(
            syn >= 0,
            rng.rand(C, G * K).astype(np.float32) * 1.2 - 0.2,
            -1.0,
        ).astype(np.float32)
        cols = np.sort(rng.choice(C, A, replace=False)).astype(np.int32)
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))
        act_ref = np.asarray(synapse_activation_xla(
            jnp.asarray(syn), jnp.asarray(cols), bits, D)) & (perm >= 0)
        v = np.asarray(synapse_activation_conn_tpu(
            jnp.asarray(syn), jnp.asarray(perm), jnp.asarray(cols),
            bits, D, 0.5, K, block=8, interpret=True,
        ), np.float32)
        np.testing.assert_array_equal(v != 0, act_ref)
        np.testing.assert_array_equal(v > 1, act_ref & (perm >= 0.5))
        # and vs the XLA dispatch form (identical packed encoding)
        from bithtm_tpu.ops.active_set import synapse_activation_conn

        ref_v = synapse_activation_conn(
            jnp.asarray(syn), jnp.asarray(perm), jnp.asarray(cols),
            bits, D, 0.5, K,
        )
        np.testing.assert_array_equal(
            v, np.asarray(ref_v, np.float32)
        )

def test_bisect_matcher_matches_xla():
    """The bisection-gather matcher (dispatched at A >= BISECT_MIN_ACTIVE
    with a 128-chunkable lane axis) vs the XLA fallback — covers L=1
    (A <= 128), L > 1 (A > 128), and both W=1 / W=2 word counts."""
    from bithtm_tpu.ops.pallas_kernels import (
        BISECT_MIN_ACTIVE,
        _matcher_inputs,
    )

    rng = np.random.RandomState(4)
    cases = [
        # (C, D, J, A): L=1 single-word, L=1 two-word, L=2 two-word
        (1024, 32, 256, 96),
        (1024, 64, 256, 96),
        (2048, 64, 384, 200),
    ]
    for C, D, J, A in cases:
        assert A >= BISECT_MIN_ACTIVE and J % 128 == 0
        N = C * D
        syn = rng.randint(-1, N, size=(C, J)).astype(np.int32)
        cols = rng.choice(C, A, replace=False).astype(np.int32)  # unsorted
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))
        bisect_L, hash_match, _, _ = _matcher_inputs(
            jnp.asarray(cols), bits, J)
        assert bisect_L == -(-A // 128) and not hash_match, (A, bisect_L)
        ref = np.asarray(
            synapse_activation_xla(
                jnp.asarray(syn), jnp.asarray(cols), bits, D
            )
        )
        got = np.asarray(
            synapse_activation_tpu(
                jnp.asarray(syn), jnp.asarray(cols), bits, D,
                block=128, interpret=True,
            )
        ) != 0
        np.testing.assert_array_equal(got, ref)


def test_bisect_table_update_matches_xla():
    """Full fused table kernel through the bisection matcher branch."""
    rng = np.random.RandomState(5)
    C, G, K, A, D = 512, 4, 32, 80, 64
    J = G * K
    N = C * D
    syn = rng.randint(-1, N, size=(C, J)).astype(np.int32)
    perm = np.where(
        syn >= 0, rng.rand(C, J).astype(np.float32) * 0.1 - 0.02, -1.0
    ).astype(np.float32)
    act_prev = (rng.rand(C, J) < 0.5) & (syn >= 0)
    pun = rng.rand(C, G) < 0.3
    pun_word = (pun.astype(np.int32) << np.arange(G)).sum(axis=-1).astype(
        np.int32
    )
    cols = rng.choice(C, A, replace=False).astype(np.int32)
    rows = rng.rand(A, D) < 0.5
    bits = pack_bits(jnp.asarray(rows))
    seg_cell = rng.randint(0, D + 1, size=(C, G)).astype(np.int32)
    act_prev_packed = pack_act_conn(
        jnp.asarray(act_prev), jnp.asarray(act_prev & (perm >= 0.05)), K
    )
    ref = table_update_xla(
        jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
        jnp.asarray(pun_word), jnp.asarray(cols), bits,
        jnp.asarray(seg_cell), D, 0.03, 0.05, 2, 1,
    )
    got = table_update_tpu(
        jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
        jnp.asarray(pun_word), jnp.asarray(cols), bits, D, K,
        0.03, 0.05, block=128, interpret=True,
    )
    for r, g in zip(ref[:2], got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_hash_matcher_matches_xla():
    """The salted-hash matcher (dispatched at A < HASH_MAX_ACTIVE with a
    128-chunkable lane axis) vs the XLA fallback — covers W=1 and W=2,
    and a crafted active set that forces the overflow chain."""
    from bithtm_tpu.ops.pallas_kernels import (
        HASH_MAX_ACTIVE,
        _HASH_CAP,
        _hash7,
        _matcher_inputs,
        hash_salt,
    )

    rng = np.random.RandomState(6)
    for C, D, J, A in ((2048, 32, 256, 41), (1024, 64, 256, 41),
                       (2048, 32, 384, 47)):
        assert A < HASH_MAX_ACTIVE and J % 128 == 0
        N = C * D
        syn = rng.randint(-1, N, size=(C, J)).astype(np.int32)
        cols = rng.choice(C, A, replace=False).astype(np.int32)
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))
        _, hash_match, _, _ = _matcher_inputs(jnp.asarray(cols), bits, J)
        assert hash_match
        ref = np.asarray(
            synapse_activation_xla(
                jnp.asarray(syn), jnp.asarray(cols), bits, D
            )
        )
        got = np.asarray(
            synapse_activation_tpu(
                jnp.asarray(syn), jnp.asarray(cols), bits, D,
                block=128, interpret=True,
            )
        ) != 0
        np.testing.assert_array_equal(got, ref)

    # craft _HASH_CAP + 2 columns that collide into one bucket under
    # the FIRST candidate salt: the zero-spill search must REJECT that
    # salt and advance to one where every bucket holds <= CAP entries
    # (there is no overflow chain in the kernel to absorb spills)
    from bithtm_tpu.ops.pallas_kernels import _HASH_SALT0

    C, D, J, A = 4096, 32, 256, 40
    salt0 = np.int32(np.int64(_HASH_SALT0) | 1)
    h_all = np.asarray(
        _hash7(jnp.arange(C, dtype=jnp.int32), jnp.int32(salt0)))
    bucket = np.argmax(np.bincount(h_all, minlength=128))
    over = np.where(h_all == bucket)[0][: _HASH_CAP + 2].astype(np.int32)
    assert len(over) == _HASH_CAP + 2
    rest = np.setdiff1d(
        rng.choice(C, A, replace=False).astype(np.int32), over
    )[: A - len(over)]
    cols = np.concatenate([over, rest]).astype(np.int32)
    assert len(cols) == A
    salt = np.int32(hash_salt(jnp.asarray(cols)))
    assert salt != salt0, "zero-spill search must reject the crafted salt"
    h = np.asarray(_hash7(jnp.asarray(cols), jnp.int32(salt)))
    assert np.max(np.bincount(h, minlength=128)) <= _HASH_CAP
    rows = rng.rand(len(cols), D) < 0.5
    bits = pack_bits(jnp.asarray(rows))
    syn = rng.randint(-1, C * D, size=(C, J)).astype(np.int32)
    ref = np.asarray(
        synapse_activation_xla(jnp.asarray(syn), jnp.asarray(cols), bits, D)
    )
    got = np.asarray(
        synapse_activation_tpu(
            jnp.asarray(syn), jnp.asarray(cols), bits, D,
            block=128, interpret=True,
        )
    ) != 0
    np.testing.assert_array_equal(got, ref)


def test_hash_table_update_matches_xla():
    """Full fused table kernel through the salted-hash matcher branch."""
    rng = np.random.RandomState(7)
    C, G, K, A, D = 512, 4, 64, 41, 32
    J = G * K
    N = C * D
    syn = rng.randint(-1, N, size=(C, J)).astype(np.int32)
    perm = np.where(
        syn >= 0, rng.rand(C, J).astype(np.float32) * 0.1 - 0.02, -1.0
    ).astype(np.float32)
    act_prev = (rng.rand(C, J) < 0.5) & (syn >= 0)
    pun = rng.rand(C, G) < 0.3
    pun_word = (pun.astype(np.int32) << np.arange(G)).sum(axis=-1).astype(
        np.int32
    )
    cols = rng.choice(C, A, replace=False).astype(np.int32)
    rows = rng.rand(A, D) < 0.5
    bits = pack_bits(jnp.asarray(rows))
    seg_cell = rng.randint(0, D + 1, size=(C, G)).astype(np.int32)
    act_prev_packed = pack_act_conn(
        jnp.asarray(act_prev), jnp.asarray(act_prev & (perm >= 0.05)), K
    )
    ref = table_update_xla(
        jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
        jnp.asarray(pun_word), jnp.asarray(cols), bits,
        jnp.asarray(seg_cell), D, 0.03, 0.05, 2, 1,
    )
    got = table_update_tpu(
        jnp.asarray(syn), jnp.asarray(perm), act_prev_packed,
        jnp.asarray(pun_word), jnp.asarray(cols), bits, D, K,
        0.03, 0.05, block=128, interpret=True,
    )
    for r, g in zip(ref[:2], got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_small_table_take_kernel_parity():
    """Chunked-dynamic-gather small-table lookup == plain indexing, for
    in-range indices; out-of-range indices land on the zero padding or
    match no chunk (the caller masks them)."""
    from bithtm_tpu.ops.pallas_kernels import small_table_take_tpu

    rng = np.random.RandomState(3)
    for Wc, S in ((768, 16), (128, 8), (700, 24), (129, 8)):
        table = rng.randint(0, 1 << 20, size=Wc).astype(np.int32)
        idx = rng.randint(0, Wc, size=(S, 128)).astype(np.int32)
        got = np.asarray(
            small_table_take_tpu(jnp.asarray(table), jnp.asarray(idx),
                                 interpret=True)
        )
        np.testing.assert_array_equal(got, table[idx])
        chunks = (Wc + 127) // 128
        # sentinel-decoded indices must return a deterministic 0 both
        # INSIDE the zero-padded table tail [Wc, chunks*128) — the
        # range sortfill_packed_idx's sentinel actually hits when Wc
        # is not a multiple of 128 (e.g. Wc=129 -> idx 255) — and
        # past the padded end (no chunk matches)
        probes = [(1 << 11) - 1]
        if chunks * 128 > Wc:
            probes.append(chunks * 128 - 1)
        for p_idx in probes:
            over = np.full((8, 128), p_idx, np.int32)
            got2 = np.asarray(
                small_table_take_tpu(jnp.asarray(table),
                                     jnp.asarray(over), interpret=True)
            )
            np.testing.assert_array_equal(got2, 0)


def test_frozen_kernel_matches_conn_paths():
    """The frozen-serving word kernel (one packed i32 per slot) is
    bit-identical to both the XLA frozen decode and the unpacked
    `synapse_activation_conn` — the contract `htm_serve_scan`'s
    bit-equality rests on."""
    from bithtm_tpu.ops.active_set import (
        pack_frozen_table,
        synapse_activation_conn,
        synapse_activation_frozen,
    )
    from bithtm_tpu.ops.pallas_kernels import synapse_activation_frozen_tpu

    rng = np.random.RandomState(5)
    # J=32 exercises the compare-chain matcher; J=128 the salted hash
    for D, A, K in ((4, 3, 8), (40, 3, 8), (32, 6, 8), (32, 6, 32)):
        C, G = 16, 4
        N = C * D
        syn = rng.randint(-1, N, size=(C, G * K)).astype(np.int32)
        # stale punishment-death victims (syn >= 0, perm < 0) must pack
        # to dead words
        perm = np.where(
            syn >= 0,
            rng.rand(C, G * K).astype(np.float32) * 1.2 - 0.2,
            -1.0,
        ).astype(np.float32)
        cols = np.sort(rng.choice(C, A, replace=False)).astype(np.int32)
        rows = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows))

        word = pack_frozen_table(jnp.asarray(syn), jnp.asarray(perm), 0.5)
        assert np.asarray(
            (word >= 0) == ((syn >= 0) & (perm >= 0))
        ).all()

        ref_v = np.asarray(synapse_activation_conn(
            jnp.asarray(syn), jnp.asarray(perm), jnp.asarray(cols),
            bits, D, 0.5, K,
        ), np.float32)
        xla_v = np.asarray(synapse_activation_frozen(
            word, jnp.asarray(cols), bits, D, K), np.float32)
        np.testing.assert_array_equal(xla_v, ref_v)
        kern_v = np.asarray(synapse_activation_frozen_tpu(
            word, jnp.asarray(cols), bits, D, K, block=8, interpret=True,
        ), np.float32)
        np.testing.assert_array_equal(kern_v, ref_v)


def test_serving_activation_kernel_matches_xla():
    """The compact-serving activation kernel (`serving_activation_tpu`,
    interpret mode) vs `serving_activation_xla` — hash (A=41) and chain
    (A=50) matcher forms, with empty (-1) lanes present."""
    from bithtm_tpu.ops.pallas_kernels import serving_activation_tpu
    from bithtm_tpu.ops.serving import SERVING_G_BITS, serving_activation_xla

    rng = np.random.RandomState(9)
    C, D, G = 512, 32, 4
    N = C * D
    for A in (41, 50):
        R = 520  # main + ext-ish rows; block must divide -> use 8
        cell = rng.randint(0, N, size=(R, 128)).astype(np.int32)
        g = rng.randint(0, G, size=(R, 128)).astype(np.int32)
        words = (cell << SERVING_G_BITS) | g
        words[rng.rand(R, 128) < 0.4] = -1
        cols = rng.choice(C, A, replace=False).astype(np.int32)
        rows_m = rng.rand(A, D) < 0.5
        bits = pack_bits(jnp.asarray(rows_m))
        ref = np.asarray(serving_activation_xla(
            jnp.asarray(words), jnp.asarray(cols), bits, D))
        got = np.asarray(serving_activation_tpu(
            jnp.asarray(words), jnp.asarray(cols), bits, D,
            block=8, interpret=True))
        np.testing.assert_array_equal(got, ref)
