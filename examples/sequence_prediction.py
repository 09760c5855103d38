"""End-to-end sequence forecasting: encoder -> HTM -> SDR classifier.

A repeating melody of scalar values streams through a learning HTM; the
online softmax readout decodes the TM's *predictive* cells into a
forecast of the next value, one step ahead. Prints forecast accuracy
per training phase — near-random at first, near-perfect once the
sequence is learned.

Run: python examples/sequence_prediction.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bithtm_tpu import (
        ScalarEncoder,
        bucket_value,
        bucketize,
        classifier_init,
        classifier_predict,
        classifier_update,
        htm_init,
        htm_step,
        make_htm_config,
    )

    melody = [0.0, 2.0, 4.0, 5.0, 4.0, 2.0, 0.0, 7.0]  # repeating sequence
    lo, hi, buckets = 0.0, 7.0, 8
    enc = ScalarEncoder(lo, hi, size=256, active_bits=17)
    cfg = make_htm_config(
        input_dim=enc.size, column_dim=512, cell_dim=8, active_columns=16,
        segment_activation_threshold=8, segment_matching_threshold=8,
        segment_sampling_synapses=16,
        sp_overrides={"boosting_intensity": 0.0},
    )
    state = htm_init(jax.random.key(0), cfg)
    step = jax.jit(functools.partial(htm_step, cfg), static_argnums=(2,))
    cls = classifier_init(cfg.tm.num_cells, buckets)
    upd = jax.jit(classifier_update)

    prev_pred = None
    hits = []
    for epoch in range(40):
        ok = 0
        for v in melody:
            target = bucketize(v, lo, hi, buckets)
            if prev_pred is not None:
                probs = classifier_predict(cls, prev_pred)
                forecast = float(bucket_value(jnp.argmax(probs), lo, hi,
                                              buckets))
                ok += abs(forecast - v) < 0.5
                cls = upd(cls, prev_pred, target)
            state, out = step(state, jnp.asarray(enc(v)), True)
            prev_pred = out.tm.prediction
        hits.append(ok / len(melody))
    print("next-value forecast accuracy per 5-epoch phase:")
    acc = np.asarray(hits).reshape(-1, 5).mean(axis=1)
    print("  " + " ".join(f"{a:.2f}" for a in acc))
    assert acc[-1] > 0.9, acc
    print("sequence prediction works.")


if __name__ == "__main__":
    main()
