"""Mesh sharding: the (data x model) sharded step must produce exactly
the same results as the unsharded batched step, and self-compose (carry
sharding in == out). Runs on the 8 virtual CPU devices set up by
conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu import htm_init_batch, make_htm_config
from bithtm_tpu.models.htm import htm_step_batch
from bithtm_tpu.parallel.mesh import make_mesh, shard_batched_state, sharded_step
from bithtm_tpu.utils.checks import assert_trees_bit_equal


def small_cfg():
    return make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )


def _run(cfg, step, state, xs):
    outs = []
    for x in xs:
        state, metrics = step(state, x)
        outs.append(metrics["bursting"])
    return state, np.asarray(jax.device_get(outs))


def test_sharded_step_matches_unsharded():
    cfg = small_cfg()
    B = 4
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(B, cfg.input_dim) < 0.2) for _ in range(6)]

    # unsharded reference
    state_ref = htm_init_batch(jax.random.key(0), cfg, B)
    step_ref = jax.jit(lambda s, x: (
        lambda r: (r[0], r[1].metrics)
    )(htm_step_batch(cfg, s, x, True)))
    final_ref, burst_ref = _run(cfg, step_ref, state_ref, xs)

    # sharded: 2-way data x 4-way model
    mesh = make_mesh(n_data=2, n_model=4)
    state_sh = shard_batched_state(
        htm_init_batch(jax.random.key(0), cfg, B), mesh
    )
    step_sh = sharded_step(cfg, mesh, learning=True)
    final_sh, burst_sh = _run(cfg, step_sh, state_sh, xs)

    np.testing.assert_array_equal(burst_sh, burst_ref)
    assert_trees_bit_equal(jax.device_get(final_sh), jax.device_get(final_ref))


def test_model_parallel_all_devices_multiword():
    """All-8-device model parallelism at a mid geometry with the
    multi-word cell-bitmask path (D=64 -> W=2) and the fast-stack pool
    shape — the per-suite guard for the scaled-config sharding
    (`scripts/model_parallel_16k_check.py` is the full-shape release
    check). Bit-equality of final state + step metrics vs unsharded."""
    cfg = make_htm_config(
        input_dim=128, column_dim=512, cell_dim=64, active_columns=10,
        segments_per_column=4, synapse_capacity=64,
        segment_activation_threshold=3, segment_matching_threshold=3,
        segment_sampling_synapses=8,
        sp_overrides={"permanence_dtype": "int16"},
    )
    B = 2
    rng = np.random.RandomState(2)
    xs = [jnp.asarray(rng.rand(B, cfg.input_dim) < 0.2) for _ in range(4)]

    state_ref = htm_init_batch(jax.random.key(3), cfg, B)
    step_ref = jax.jit(lambda s, x: (
        lambda r: (r[0], r[1].metrics)
    )(htm_step_batch(cfg, s, x, True)))
    final_ref, burst_ref = _run(cfg, step_ref, state_ref, xs)

    mesh = make_mesh(n_data=1, n_model=8)
    state_sh = shard_batched_state(
        htm_init_batch(jax.random.key(3), cfg, B), mesh
    )
    final_sh, burst_sh = _run(cfg, sharded_step(cfg, mesh, learning=True),
                              state_sh, xs)

    np.testing.assert_array_equal(burst_sh, burst_ref)
    assert_trees_bit_equal(jax.device_get(final_sh), jax.device_get(final_ref))


def test_sharded_carry_layout_stable():
    """The sharded step's output state must be directly feedable back in
    (no host round trip, no resharding)."""
    cfg = small_cfg()
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_batched_state(htm_init_batch(jax.random.key(1), cfg, 8),
                                mesh)
    step = sharded_step(cfg, mesh, learning=True)
    rng = np.random.RandomState(1)
    for _ in range(3):
        x = jnp.asarray(rng.rand(8, cfg.input_dim) < 0.2)
        state, metrics = step(state, x)
    burst = np.asarray(jax.device_get(metrics["bursting"]))
    assert burst.shape == (8,) and (burst >= 0).all()


def test_local_batch_slice_single_process():
    from bithtm_tpu.parallel.distributed import local_batch_slice

    s = local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)  # single-process: whole batch


def test_sharded_serve_matches_unsharded():
    """Model-parallel serving: the winner-pass-free serve step over a
    (2 data x 4 model) mesh is bit-equal to the unsharded serve path."""
    from bithtm_tpu.models.htm import htm_scan
    from bithtm_tpu.parallel.mesh import sharded_serve_step

    cfg = small_cfg()
    B = 4
    rng = np.random.RandomState(7)
    train = jnp.asarray(rng.rand(10, B, cfg.input_dim) < 0.2)
    xs = [jnp.asarray(rng.rand(B, cfg.input_dim) < 0.2) for _ in range(5)]

    trained, _ = htm_scan(
        cfg, htm_init_batch(jax.random.key(6), cfg, B), train, True
    )
    trained = jax.device_get(trained)

    step_ref = jax.jit(lambda s, x: (
        lambda r: (r[0], r[1].metrics)
    )(htm_step_batch(cfg, s, x, learning=False, compute_winner=False)))
    state_ref = jax.tree.map(jnp.asarray, trained)
    outs_ref = []
    for x in xs:
        state_ref, m = step_ref(state_ref, x)
        outs_ref.append(m["bursting"])

    mesh = make_mesh(n_data=2, n_model=4)
    state_sh = shard_batched_state(jax.tree.map(jnp.asarray, trained), mesh)
    step_sh = sharded_serve_step(cfg, mesh)
    outs_sh = []
    for x in xs:
        state_sh, m = step_sh(state_sh, x)
        outs_sh.append(m["bursting"])

    np.testing.assert_array_equal(np.asarray(jax.device_get(outs_sh)),
                                  np.asarray(jax.device_get(outs_ref)))
    assert_trees_bit_equal(jax.device_get(state_sh),
                           jax.device_get(state_ref))
