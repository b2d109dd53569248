"""Typed training reports (re-design of ``/root/reference/src/report.jl``).

Every phase of training produces a small dataclass that flows through the
Handlers callbacks to the session layer (logging / JSON / plots), exactly as
in the reference.  All reports are JSON-serializable via ``to_dict``.
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Any, List, Optional


def to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {f.name: to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [to_dict(x) for x in obj]
    if hasattr(obj, "item"):  # numpy / jax scalars
        return obj.item()
    return obj


@dataclasses.dataclass
class Loss:
    """Loss decomposition ``L = Lp + Lv + Lreg + Linv``
    (``src/report.jl:21-27``)."""

    L: float
    Lp: float
    Lv: float
    Lreg: float
    Linv: float


@dataclasses.dataclass
class LearningStatus:
    """(``src/report.jl:42-46``)"""

    loss: Loss
    Hp: float      # entropy of the MCTS policies in memory
    Hpnet: float   # entropy of the network policy


@dataclasses.dataclass
class Evaluation:
    """(``src/report.jl:73-80``)"""

    legend: str
    avgr: float
    redundancy: float
    rewards: List[float]
    baseline_rewards: Optional[List[float]]
    time: float


@dataclasses.dataclass
class Checkpoint:
    """(``src/report.jl:101-106``)"""

    batch_id: int
    evaluation: Optional[Evaluation]
    status_after_update: LearningStatus
    nn_replaced: bool


@dataclasses.dataclass
class Learning:
    """(``src/report.jl:123-132``)"""

    time_convert: float
    time_loss: float
    time_train: float
    time_eval: float
    initial_status: LearningStatus
    losses: List[float]
    checkpoints: List[Checkpoint]
    nn_replaced: bool


@dataclasses.dataclass
class Samples:
    """(``src/report.jl:145-152``)"""

    num_samples: int
    num_boards: int
    Wtot: float
    status: LearningStatus


@dataclasses.dataclass
class StageSamples:
    """Samples bucketed by remaining game length (``src/report.jl:160-166``)."""

    min_remaining_length: float
    max_remaining_length: float
    samples_stats: Samples


@dataclasses.dataclass
class Memory:
    """(``src/report.jl:174-186``)"""

    latest_batch: Samples
    all_samples: Samples
    per_game_stage: List[StageSamples]


@dataclasses.dataclass
class SelfPlay:
    """(``src/report.jl:203-209``)"""

    samples_gen_speed: float          # samples / second
    average_exploration_depth: float
    mcts_memory_footprint: int        # bytes of the search tree arrays
    memory_size: int
    memory_num_distinct_boards: int


@dataclasses.dataclass
class Perfs:
    """Wall-clock / memory of a phase (``src/report.jl:219-223``)."""

    time: float
    allocated_bytes: int = 0
    gc_time: float = 0.0


@dataclasses.dataclass
class Initial:
    """(``src/report.jl:253-259``)"""

    num_network_parameters: int
    num_network_regularized_parameters: int
    mcts_footprint_per_node: int
    errors: List[str]
    warnings: List[str]


@dataclasses.dataclass
class Iteration:
    """(``src/report.jl:235-242``)"""

    perfs_self_play: Perfs
    perfs_memory_analysis: Perfs
    perfs_learning: Perfs
    self_play: SelfPlay
    memory: Optional[Memory]
    learning: Learning


class timed:
    """Context manager version of ``Report.@timed`` (``src/report.jl:265-270``)."""

    def __enter__(self):
        self.t0 = _time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.time = _time.perf_counter() - self.t0
        return False

    @property
    def perfs(self) -> Perfs:
        return Perfs(time=self.time)
