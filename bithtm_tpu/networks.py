"""Object-style wrappers mirroring the reference public API.

The reference exposes stateful classes with `.process(...)` methods
(`networks.py:7-149`). These wrappers hold the functional state pytree
and call the jitted functional step, so a user of the reference can
switch with minimal friction:

    htm = HierarchicalTemporalMemory(1000, 2048, 32)
    sp_state, tm_state = htm.process(input_bits)

Under the hood everything is the functional API (`htm_step` etc.); for
throughput use that directly with `htm_scan`/`htm_step_batch`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import HTMConfig, SPConfig, make_htm_config, make_tm_config
from .models.htm import htm_step
from .models.spatial_pooler import sp_step
from .models.temporal_memory import tm_step
from .state import htm_init, sp_init, tm_init


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8, 9, 10))
def _jit_htm_step(cfg, state, x, learning, compute_winner,
                  boosting, inhibition, temporal_memory,
                  overlap, proximal_update, distal_forward):
    return htm_step(cfg, state, x, learning, compute_winner,
                    boosting=boosting, inhibition=inhibition,
                    temporal_memory=temporal_memory,
                    overlap=overlap, proximal_update=proximal_update,
                    distal_forward=distal_forward)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _jit_sp_step(cfg, state, x, learning, boosting, inhibition,
                 overlap, proximal_update):
    return sp_step(cfg, state, x, learning,
                   boosting=boosting, inhibition=inhibition,
                   overlap=overlap, proximal_update=proximal_update)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _jit_tm_step(cfg, state, key, active_cols, learning, compute_winner,
                 epsilon):
    return tm_step(cfg, state, key, active_cols, learning=learning,
                   compute_winner=compute_winner, epsilon=epsilon)


class SpatialPooler:
    """Stateful wrapper over `sp_step` (reference `networks.py:7-35`).

    `boosting` / `inhibition` are optional component hooks (see
    `sp_step`), mirroring the reference's constructor injection of
    `ExponentialBoosting` / `GlobalInhibition` (`networks.py:14-24`).
    They must be hashable jit-traceable callables (e.g. module-level
    functions)."""

    def __init__(self, input_dim, column_dim, active_columns, seed=0,
                 boosting=None, inhibition=None, overlap=None,
                 proximal_update=None, **overrides):
        self.config = SPConfig(input_dim=input_dim, column_dim=column_dim,
                               active_columns=active_columns, **overrides)
        self.active_columns = active_columns
        self.boosting = boosting
        self.inhibition = inhibition
        self.overlap = overlap
        self.proximal_update = proximal_update
        self.state = sp_init(jax.random.key(seed), self.config)

    def process(self, input_bits, learning=True):
        x = jnp.asarray(np.asarray(input_bits), jnp.bool_)
        self.state, out = _jit_sp_step(self.config, self.state, x, learning,
                                       self.boosting, self.inhibition,
                                       self.overlap, self.proximal_update)
        return out


class TemporalMemory:
    """Stateful wrapper over `tm_step` (reference `networks.py:38-128`)."""

    def __init__(self, column_dim, cell_dim, active_columns=None, seed=0,
                 **overrides):
        if active_columns is None:
            active_columns = round(column_dim * 0.02)
        self.config = make_tm_config(column_dim, cell_dim, active_columns,
                                     **overrides)
        self.state = tm_init(self.config)
        self.key = jax.random.key(seed)

    def process(self, sp_output, learning=True, return_winner_cell=True,
                epsilon=None):
        """`epsilon` overrides the config's tie-equality tolerance for
        this call (reference `networks.py:91`).

        NOTE: epsilon is part of the compiled program (it feeds
        jit-static config), so each *distinct* value compiles its own
        TM step. Fine for a handful of values; do NOT sweep/anneal it
        per step — set it in the config instead."""
        self.key, sub = jax.random.split(self.key)
        self.state, out = _jit_tm_step(
            self.config, self.state, sub, sp_output.active_columns,
            learning, return_winner_cell, epsilon,
        )
        return out


class HierarchicalTemporalMemory:
    """Stateful wrapper over `htm_step` (reference `networks.py:131-149`).

    `boosting` / `inhibition` / `temporal_memory` are optional component
    hooks, mirroring the reference's constructor injection
    (`networks.py:134,144` — its example swaps in the oracle TM through
    `temporal_memory=`, `example.py:7-12`). See `htm_step` for the hook
    signatures; hooks must be hashable jit-traceable callables — for
    non-jittable host code (a NumPy TM, like the reference's example
    swap), wrap it in `HostTemporalMemory` (see `host_hooks`)."""

    def __init__(self, input_dim, column_dim, cell_dim, active_columns=None,
                 seed=0, boosting=None, inhibition=None,
                 temporal_memory=None, overlap=None, proximal_update=None,
                 distal_forward=None, **tm_overrides):
        self.config: HTMConfig = make_htm_config(
            input_dim, column_dim, cell_dim, active_columns, **tm_overrides
        )
        self.column_dim = column_dim
        self.cell_dim = cell_dim
        self.active_columns = self.config.sp.active_columns
        self.boosting = boosting
        self.inhibition = inhibition
        self.temporal_memory = temporal_memory
        self.overlap = overlap
        self.proximal_update = proximal_update
        self.distal_forward = distal_forward
        self.state = htm_init(jax.random.key(seed), self.config)

    def process(self, input_bits, learning=True, return_winner_cell=True):
        x = jnp.asarray(np.asarray(input_bits), jnp.bool_)
        self.state, out = _jit_htm_step(
            self.config, self.state, x, learning, return_winner_cell,
            self.boosting, self.inhibition, self.temporal_memory,
            self.overlap, self.proximal_update, self.distal_forward,
        )
        self.last_metrics = {k: np.asarray(v) for k, v in out.metrics.items()}
        return out.sp, out.tm
