"""Checkpoint/resume: a restored stream must continue bit-identically.

The reference has no persistence at all (model state lives in live NumPy
arrays, SURVEY.md §5); here the whole model is one pytree, so a
checkpoint is a faithful mid-sequence snapshot including the recurrent
distal state and RNG key.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu import htm_init, htm_scan, make_htm_config
from bithtm_tpu.utils.checkpoint import restore, save


def small_cfg():
    return make_htm_config(
        input_dim=64, column_dim=64, cell_dim=4, active_columns=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8,
    )


def test_roundtrip_resume_bitexact(tmp_path):
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    seq1 = jnp.asarray(rng.rand(10, cfg.input_dim) < 0.2)
    seq2 = jnp.asarray(rng.rand(10, cfg.input_dim) < 0.2)

    state = htm_init(jax.random.key(0), cfg)
    state, _ = htm_scan(cfg, state, seq1, True)

    path = str(tmp_path / "ckpt")
    save(path, state)
    restored = restore(path, htm_init(jax.random.key(1), cfg))

    # resuming from the checkpoint must match the uninterrupted run
    cont_a, ma = htm_scan(cfg, state, seq2, True)
    cont_b, mb = htm_scan(cfg, restored, seq2, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(cont_a.tm),
        jax.device_get(cont_b.tm),
    )
    np.testing.assert_array_equal(
        np.asarray(ma["bursting"]), np.asarray(mb["bursting"])
    )


def test_npz_backend_roundtrip_bitexact(tmp_path):
    """The forced-npz writer (used for per-process shard checkpoints in
    jax.distributed jobs) round-trips every dtype bit-exactly —
    including extension dtypes like the bf16 synapse-activity cache,
    which npz stores as raw void bytes."""
    cfg = small_cfg()
    rng = np.random.RandomState(3)
    seq = jnp.asarray(rng.rand(8, cfg.input_dim) < 0.2)
    state = htm_init(jax.random.key(2), cfg)
    state, _ = htm_scan(cfg, state, seq, True)

    path = str(tmp_path / "npz_ckpt")
    save(path, state, backend="npz")
    import os

    assert os.path.exists(os.path.join(path, "state.npz"))
    restored = restore(path, htm_init(jax.random.key(9), cfg))
    assert restored.tm.synapse_act.dtype == state.tm.synapse_act.dtype
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(state.tm),
        jax.device_get(restored.tm),
    )
