"""Multi-level hierarchy: layers chain dimensionally, learn bottom-up,
and the upper layer stabilizes on sequence identity."""

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu.models.stack import (
    make_stack_config,
    stack_init,
    stack_scan,
    stack_step,
)


def make_cfg():
    return make_stack_config(
        input_dim=64,
        layer_dims=[(64, 4), (48, 4)],
        active_columns=4,
        segment_activation_threshold=2,
        segment_matching_threshold=2,
        segment_sampling_synapses=8,
        sp_overrides={"boosting_intensity": 0.05},
    )


def test_dimensional_chaining():
    cfg = make_cfg()
    assert cfg.layers[0].input_dim == 64
    assert cfg.layers[1].input_dim == cfg.layers[0].tm.num_cells


def test_stack_learns_both_layers():
    cfg = make_cfg()
    state = stack_init(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    pats = rng.rand(5, 64) < 0.2
    seq = jnp.asarray(np.tile(pats, (15, 1)))
    state, metrics = stack_scan(cfg, state, seq, True)
    b0 = np.asarray(metrics["L0_bursting"])
    b1 = np.asarray(metrics["L1_bursting"])
    # both layers converge: late bursting far below early
    assert b0[-10:].mean() < b0[:10].mean() / 3
    assert b1[-10:].mean() < b1[:10].mean() / 3


def test_stack_single_step_and_scan_agree():
    cfg = make_cfg()
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.rand(6, 64) < 0.2)

    s_loop = stack_init(jax.random.key(3), cfg)
    import functools
    step = jax.jit(functools.partial(stack_step, cfg), static_argnums=(2,))
    for x in seq:
        s_loop, out = step(s_loop, x, True)

    s_scan = stack_init(jax.random.key(3), cfg)
    s_scan, _ = stack_scan(cfg, s_scan, seq, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(tuple(s.tm for s in s_loop)),
        jax.device_get(tuple(s.tm for s in s_scan)),
    )
