"""Static configuration for the TPU-native HTM framework.

The reference (cokwa/bitHTM) scatters hyperparameters across constructor
defaults (`projections.py:7-10,205-223`, `regularizations.py:5-7`,
`networks.py:132-137`). Here they live in frozen dataclasses so they are
hashable jit-static arguments; array shapes derived from them are static,
which is what XLA's compilation model requires.

Capacity fields (``segment_capacity``, ``synapse_capacity``,
``max_learning_segments``, ``max_winner_cells``, ``max_new_segments``) have
no reference counterpart: the reference grows its tables dynamically
(`utils.py:79-135`). A TPU-native build pre-allocates padded tables and
treats growth as masked writes (see `bithtm_tpu/models/temporal_memory.py`).
"""

from __future__ import annotations

import dataclasses


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SPConfig:
    """SpatialPooler hyperparameters.

    Defaults mirror the reference: `projections.py:7-10` (proximal
    permanences), `regularizations.py:5-7` (boosting).
    """

    input_dim: int
    column_dim: int
    active_columns: int

    permanence_mean: float = 0.0
    permanence_std: float = 0.1
    permanence_threshold: float = 0.0
    permanence_increment: float = 0.03
    permanence_decrement: float = 0.015

    boosting_intensity: float = 0.3
    duty_cycle_momentum: float = 0.99

    @property
    def density(self) -> float:
        # regularizations.py:9
        return self.active_columns / self.column_dim


@dataclasses.dataclass(frozen=True)
class TMConfig:
    """TemporalMemory hyperparameters.

    Algorithmic defaults mirror `projections.py:205-223`. Capacity fields
    are new (static-shape pools replacing `DynamicArray2D` growth).
    """

    column_dim: int
    cell_dim: int

    # Static pool capacities (TPU-native; no reference counterpart).
    segment_capacity: int = 0        # S: total segment slots in the pool
    synapse_capacity: int = 0        # K: synapse slots per segment
    max_learning_segments: int = 0   # L: compaction width for learning segments
    max_winner_cells: int = 0        # W: compaction width for prev winner cells
    max_new_segments: int = 0        # U: max segments allocated per step

    # Distal permanence dynamics (projections.py:205-219).
    permanence_initial: float = 0.21
    permanence_threshold: float = 0.5
    permanence_increment: float = 0.1
    permanence_decrement: float = 0.1
    permanence_punishment: float = 0.01

    # Segment thresholds (projections.py:221-223).
    segment_activation_threshold: int = 15
    segment_matching_threshold: int = 15
    segment_sampling_synapses: int = 32

    epsilon: float = 1e-8

    @property
    def num_cells(self) -> int:
        return self.column_dim * self.cell_dim


@dataclasses.dataclass(frozen=True)
class HTMConfig:
    sp: SPConfig
    tm: TMConfig

    @property
    def input_dim(self) -> int:
        return self.sp.input_dim

    @property
    def column_dim(self) -> int:
        return self.sp.column_dim

    @property
    def cell_dim(self) -> int:
        return self.tm.cell_dim


def make_tm_config(
    column_dim: int,
    cell_dim: int,
    active_columns: int,
    *,
    segment_capacity: int | None = None,
    synapse_capacity: int | None = None,
    max_learning_segments: int | None = None,
    max_winner_cells: int | None = None,
    max_new_segments: int | None = None,
    **overrides,
) -> TMConfig:
    """Build a TMConfig with TPU-friendly derived capacities.

    Capacity heuristics: the reference's pool at the default 2048x32 config
    stabilises around one segment per (column, pattern-context); 8 segment
    slots per column is generous. Learning touches at most a few segments
    per active column per step; winner cells are ~1 per active column in
    steady state with headroom for multi-predicted columns.
    """
    if segment_capacity is None:
        segment_capacity = _round_up(column_dim * 8, 128)
    if synapse_capacity is None:
        synapse_capacity = 48  # 32 sampled (projections.py:223) + headroom
    if max_learning_segments is None:
        max_learning_segments = max(32, 4 * active_columns)
    if max_winner_cells is None:
        max_winner_cells = max(32, 8 * active_columns)
    if max_new_segments is None:
        max_new_segments = max(8, active_columns)
    return TMConfig(
        column_dim=column_dim,
        cell_dim=cell_dim,
        segment_capacity=segment_capacity,
        synapse_capacity=synapse_capacity,
        max_learning_segments=max_learning_segments,
        max_winner_cells=max_winner_cells,
        max_new_segments=max_new_segments,
        **overrides,
    )


def make_htm_config(
    input_dim: int,
    column_dim: int,
    cell_dim: int,
    active_columns: int | None = None,
    *,
    sp_overrides: dict | None = None,
    **tm_overrides,
) -> HTMConfig:
    """Composition-root defaults, mirroring `networks.py:136-137`:
    active_columns defaults to round(0.02 * column_dim)."""
    if active_columns is None:
        active_columns = round(column_dim * 0.02)
    sp = SPConfig(
        input_dim=input_dim,
        column_dim=column_dim,
        active_columns=active_columns,
        **(sp_overrides or {}),
    )
    tm = make_tm_config(column_dim, cell_dim, active_columns, **tm_overrides)
    return HTMConfig(sp=sp, tm=tm)
