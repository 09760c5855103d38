"""SpatialPooler parity vs direct NumPy evaluation of the reference
semantics (`projections.py:6-24`, `regularizations.py:4-29`,
`networks.py:26-35`). SP forward/update is RNG-free given fixed
permanences, so these checks are exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bithtm_tpu import SPConfig, sp_init, sp_step
from bithtm_tpu.ops.overlap import unpack_connected


@pytest.fixture
def cfg():
    return SPConfig(input_dim=80, column_dim=96, active_columns=7)


def numpy_sp_step(cfg, perm, duty, x, learning):
    """Straight NumPy transcription of SURVEY.md §2 semantics 1-4."""
    weight = perm >= cfg.permanence_threshold
    overlaps = (weight & x).sum(axis=1)
    factor = np.exp(-(cfg.boosting_intensity / cfg.density) * duty)
    boosted = factor.astype(np.float32) * overlaps.astype(np.float32)
    # lax.top_k tie-break: by descending value then ascending index
    order = np.lexsort((np.arange(len(boosted)), -boosted))
    active = np.sort(order[: cfg.active_columns])
    if learning:
        perm = perm.copy()
        delta = x * (cfg.permanence_increment + cfg.permanence_decrement) \
            - cfg.permanence_decrement
        perm[active] += delta
    duty = duty * cfg.duty_cycle_momentum
    duty = duty.copy()
    duty[active] += 1.0 - cfg.duty_cycle_momentum
    return perm, duty, overlaps, active


def test_sp_matches_numpy_trajectory(cfg):
    # the physical table is lane-padded (overlap.padded_input_dim); the
    # logical [:, :input_dim] region is the parity contract and the
    # padding must stay pinned at the rail
    I = cfg.input_dim
    state = sp_init(jax.random.key(0), cfg)
    pad0 = np.asarray(state.permanence)[:, I:]
    perm = np.asarray(state.permanence)[:, :I].astype(np.float64)
    duty = np.zeros(cfg.column_dim, np.float32)
    rng = np.random.RandomState(1)
    for t in range(30):
        x = rng.rand(cfg.input_dim) < 0.25
        learning = t % 3 != 2
        state, out = sp_step(cfg, state, jnp.asarray(x), learning)
        perm, duty, overlaps, active = numpy_sp_step(
            cfg, perm, duty, x, learning
        )
        np.testing.assert_array_equal(np.asarray(out.overlaps), overlaps)
        np.testing.assert_array_equal(
            np.sort(np.asarray(out.active_columns)), active
        )
        np.testing.assert_allclose(
            np.asarray(state.permanence)[:, :I], perm, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(state.permanence)[:, I:], pad0
        )
        np.testing.assert_allclose(
            np.asarray(state.duty_cycle), duty, atol=1e-5
        )
        # cached (packed) connection matrix stays consistent with
        # permanences
        np.testing.assert_array_equal(
            np.asarray(
                unpack_connected(state.connected, cfg.input_dim)
            ),
            np.asarray(state.permanence)[:, :I] >= cfg.permanence_threshold,
        )


def test_sp_inference_does_not_touch_permanence(cfg):
    state = sp_init(jax.random.key(2), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(cfg.input_dim) < 0.3)
    new_state, _ = sp_step(cfg, state, x, False)
    np.testing.assert_array_equal(
        np.asarray(state.permanence), np.asarray(new_state.permanence)
    )
    # duty cycle updates even without learning (networks.py:33)
    assert not np.array_equal(
        np.asarray(state.duty_cycle), np.asarray(new_state.duty_cycle)
    )


def test_boosting_prefers_quiet_columns(cfg):
    # A column with high duty cycle must lose against an equal-overlap
    # column with zero duty (regularizations.py:16).
    state = sp_init(jax.random.key(3), cfg)
    duty = np.zeros(cfg.column_dim, np.float32)
    duty[:50] = 0.5
    state = state.replace(duty_cycle=jnp.asarray(duty))
    x = jnp.ones(cfg.input_dim, bool)  # all columns same input
    _, out = sp_step(cfg, state, x, False)
    assert (np.asarray(out.active_columns) >= 50).all()


def test_quantized_sp_integer_exact_trajectory():
    """int16 permanences: the whole trajectory is EXACT integer
    arithmetic — verified bit-equal against a NumPy integer model of
    the same semantics (the quantized analogue of
    test_sp_matches_numpy_trajectory)."""
    cfg = SPConfig(input_dim=80, column_dim=96, active_columns=7,
                   permanence_dtype="int16")
    q = cfg.permanence_quantum
    inc, dec = cfg.to_units(cfg.permanence_increment), \
        cfg.to_units(cfg.permanence_decrement)
    state = sp_init(jax.random.key(5), cfg)
    I = cfg.input_dim
    perm = np.asarray(state.permanence)[:, :I].astype(np.int64)
    duty = np.zeros(cfg.column_dim, np.float32)
    rng = np.random.RandomState(3)
    for t in range(30):
        x = rng.rand(cfg.input_dim) < 0.25
        state, out = sp_step(cfg, state, jnp.asarray(x), True)
        # numpy integer model
        weight = perm >= 0
        overlaps = (weight & x).sum(axis=1)
        factor = np.exp(-(cfg.boosting_intensity / cfg.density) * duty)
        boosted = factor.astype(np.float32) * overlaps.astype(np.float32)
        order = np.lexsort((np.arange(len(boosted)), -boosted))
        active = np.sort(order[: cfg.active_columns])
        perm[active] += x * (inc + dec) - dec
        duty = duty * cfg.duty_cycle_momentum
        duty[active] += 1.0 - cfg.duty_cycle_momentum

        np.testing.assert_array_equal(np.asarray(out.overlaps), overlaps)
        np.testing.assert_array_equal(
            np.sort(np.asarray(out.active_columns)), active
        )
        np.testing.assert_array_equal(  # bit-exact integer permanences
            np.asarray(state.permanence)[:, :I].astype(np.int64), perm
        )
        assert np.asarray(state.permanence).dtype == np.int16


def test_quantized_sp_rejects_offgrid_constants():
    cfg = SPConfig(input_dim=8, column_dim=8, active_columns=1,
                   permanence_dtype="int16", permanence_increment=0.0033)
    state = sp_init(jax.random.key(0), cfg)
    import pytest
    with pytest.raises(ValueError):
        sp_step(cfg, state, jnp.zeros(8, bool), True)


def test_quantized_sp_saturates_instead_of_wrapping():
    cfg = SPConfig(input_dim=8, column_dim=8, active_columns=8,
                   permanence_dtype="int16")
    state = sp_init(jax.random.key(1), cfg)
    # drive one input bit high for many steps with every column active
    x = jnp.asarray(np.eye(8, dtype=bool)[0])
    I = cfg.input_dim
    perm0 = np.asarray(state.permanence)[:, :I].astype(np.int64)
    for _ in range(40):
        state, _ = sp_step(cfg, state, x, True)
    p = np.asarray(state.permanence)[:, :I].astype(np.int64)
    assert (p <= 32000).all() and (p >= -32000 + perm0.min()).all()
    # long-run rail: clip, not wraparound (column 0 stays connected)
    state2 = state.replace(
        permanence=jnp.full_like(state.permanence, 31999),
        connected=jnp.ones_like(state.connected),
    )
    state2, _ = sp_step(cfg, state2, x, True)
    p2 = np.asarray(state2.permanence)
    assert p2.max() == 32000 and (p2 > 0).all()  # pinned, no sign flip


def test_pack_input_mapping_fuzz():
    """The packed-connected bit mapping (private to ops/overlap) must
    round-trip and preserve overlaps for any input width, including
    ragged tails (I % S != 0) and tiny widths."""
    from bithtm_tpu.ops.overlap import (input_words, overlaps,
                                        pack_input, unpack_connected)

    rng = np.random.RandomState(5)
    for I in (1, 7, 8, 9, 31, 64, 100, 125, 333, 1000):
        bits = jnp.asarray(rng.rand(6, I) < 0.4)
        words = pack_input(bits)
        assert words.shape == (6, input_words(I))
        np.testing.assert_array_equal(
            np.asarray(unpack_connected(words, I)), np.asarray(bits)
        )
        x = jnp.asarray(rng.rand(I) < 0.3)
        np.testing.assert_array_equal(
            np.asarray(overlaps(words, x)),
            (np.asarray(bits) & np.asarray(x)).sum(-1),
        )
