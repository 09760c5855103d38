"""End-to-end sequence prediction: encoder -> HTM -> SDR classifier
decodes the *next* value from the TM's predictive cells."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bithtm_tpu import htm_init, htm_step, make_htm_config
from bithtm_tpu.encoders import ScalarEncoder
from bithtm_tpu.readout import (
    bucket_value,
    bucketize,
    classifier_init,
    classifier_predict,
    classifier_update,
)


def test_classifier_learns_mapping():
    # direct check: distinct SDRs -> distinct buckets
    rng = np.random.RandomState(0)
    sdrs = jnp.asarray(rng.rand(4, 64) < 0.2)
    state = classifier_init(64, 4)
    upd = jax.jit(classifier_update)
    for _ in range(50):
        for b in range(4):
            state = upd(state, sdrs[b], jnp.int32(b))
    for b in range(4):
        probs = classifier_predict(state, sdrs[b])
        assert int(jnp.argmax(probs)) == b


def test_htm_sequence_prediction_pipeline():
    """Repeating value sequence: after training, the classifier applied
    to the TM's predictive cells recovers the next value."""
    values = [1.0, 3.0, 5.0, 2.0, 4.0, 0.0]
    buckets = 8
    enc = ScalarEncoder(0.0, 5.0, size=128, active_bits=11)
    cfg = make_htm_config(
        input_dim=enc.size, column_dim=128, cell_dim=8, active_columns=6,
        segment_activation_threshold=3, segment_matching_threshold=3,
        segment_sampling_synapses=12,
        sp_overrides={"boosting_intensity": 0.02},
    )
    state = htm_init(jax.random.key(0), cfg)
    step = jax.jit(functools.partial(htm_step, cfg), static_argnums=(2,))
    cls = classifier_init(cfg.tm.num_cells, buckets)
    upd = jax.jit(classifier_update)

    prev_pred_cells = None
    correct = []
    for epoch in range(30):
        for i, v in enumerate(values):
            x = jnp.asarray(enc(v))
            target = bucketize(v, 0.0, 5.0, buckets)
            if prev_pred_cells is not None:
                # learn: last step's predictive cells -> this value
                cls = upd(cls, prev_pred_cells, target)
                if epoch >= 25:
                    probs = classifier_predict(cls, prev_pred_cells)
                    got = bucket_value(jnp.argmax(probs), 0.0, 5.0, buckets)
                    correct.append(abs(float(got) - v) < 0.5)
            state, out = step(state, x, True)
            prev_pred_cells = out.tm.prediction
    assert np.mean(correct) > 0.8, np.mean(correct)
