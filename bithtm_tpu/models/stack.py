"""Multi-level HTM hierarchy.

The reference's `HierarchicalTemporalMemory` (`networks.py:131-149`) is a
single SP+TM level despite the name. This module adds real stacking:
layer k's SpatialPooler pools over layer k-1's active-cell SDR, so
higher layers form increasingly abstract, temporally stable
representations (upper TMs see cell-level context from below, which
encodes sequence identity, not just the current input).

Functional like everything else: `StackConfig` is a tuple of per-layer
HTMConfigs validated to chain dimensionally; state is a tuple of
HTMStates; `stack_step` runs the layers bottom-up in one jittable pass,
and scanning/batching compose exactly as for a single level.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import HTMConfig, make_htm_config
from ..state import HTMState, htm_init
from .htm import HTMOutput, htm_step


class StackConfig(NamedTuple):
    layers: tuple  # tuple[HTMConfig, ...]


class StackOutput(NamedTuple):
    layers: tuple  # tuple[HTMOutput, ...] bottom-up
    metrics: dict  # per-layer metrics, keys prefixed "L{k}_"


def make_stack_config(input_dim: int, layer_dims: Sequence[tuple],
                      **common) -> StackConfig:
    """layer_dims: [(column_dim, cell_dim), ...] bottom-up. Layer k>0
    pools over layer k-1's num_cells-wide active-cell SDR."""
    layers = []
    in_dim = input_dim
    for column_dim, cell_dim in layer_dims:
        cfg = make_htm_config(in_dim, column_dim, cell_dim, **common)
        layers.append(cfg)
        in_dim = cfg.tm.num_cells
    return StackConfig(layers=tuple(layers))


def stack_init(key: jax.Array, cfg: StackConfig):
    keys = jax.random.split(key, len(cfg.layers))
    return tuple(htm_init(k, c) for k, c in zip(keys, cfg.layers))


def stack_step(cfg: StackConfig, state, input_bits: jnp.ndarray,
               learning: bool = True):
    """One timestep through all layers bottom-up. The active-cell mask
    of layer k (temporal-context-bearing) is layer k+1's input SDR."""
    new_states = []
    outputs = []
    metrics = {}
    x = input_bits
    for k, (layer_cfg, layer_state) in enumerate(zip(cfg.layers, state)):
        with jax.named_scope(f"layer{k}"):
            layer_state, out = htm_step(layer_cfg, layer_state, x, learning)
        new_states.append(layer_state)
        outputs.append(out)
        for name, v in out.metrics.items():
            metrics[f"L{k}_{name}"] = v
        x = out.tm.active_mask
    return tuple(new_states), StackOutput(tuple(outputs), metrics)


@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def stack_scan(cfg: StackConfig, state, inputs: jnp.ndarray,
               learning: bool = True):
    """lax.scan of stack_step over a [T, input_dim] sequence. Jitted at
    module level so repeated calls hit the trace cache."""
    def body(carry, x):
        new_state, out = stack_step(cfg, carry, x, learning)
        return new_state, out.metrics

    return jax.lax.scan(body, state, inputs)
