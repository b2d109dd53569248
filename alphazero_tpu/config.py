"""Hyperparameter tree, mirroring the reference's params system.

Re-design of ``/root/reference/src/params.jl``: the same immutable nested
structure (MCTS / simulation / arena / self-play / learning / top-level
params), as frozen dataclasses with JSON round-trip.  Differences forced by
the TPU architecture:

* ``SimParams.num_workers``/``batch_size``/``fill_batches`` (async inference
  server knobs, ``src/params.jl:92-101``) are replaced by ``num_lanes`` — the
  number of games simulated in lockstep on device.  ``use_gpu`` disappears
  (device placement is jit/sharding business).
* ``reset_every`` is accepted for config parity but has no effect: trees are
  rebuilt per move by design (see ``search/mcts.py`` module docstring).
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional, Tuple

from .models.optim import OptimiserSpec
from .utils.schedules import ConstSchedule, PLSchedule, Schedule, as_schedule

CONSTANT_WEIGHT = "CONSTANT_WEIGHT"
LOG_WEIGHT = "LOG_WEIGHT"
LINEAR_WEIGHT = "LINEAR_WEIGHT"


@dataclasses.dataclass(frozen=True)
class MctsParams:
    """(``src/params.jl:49-57``)"""

    num_iters_per_turn: int
    gamma: float = 1.0
    cpuct: float = 1.0
    temperature: Schedule = ConstSchedule(1.0)
    dirichlet_noise_eps: float = 0.0
    dirichlet_noise_alpha: float = 1.0
    prior_temperature: float = 1.0
    # "puct" (reference semantics) or "gumbel" (sequential-halving root,
    # Danihelka et al. 2022 — an extension beyond the reference; see
    # search/gumbel.py).  Gumbel ignores temperature/Dirichlet knobs.
    algorithm: str = "puct"
    gumbel_max_considered: int = 16
    gumbel_c_visit: float = 50.0
    gumbel_c_scale: float = 0.1
    # cross-move subtree reuse during self-play (the array analogue of the
    # reference's per-game transposition-table persistence)
    reuse_tree: bool = False
    reuse_cap: int = 64
    # optional descent-depth cap (mctx-style; None = exact reference
    # semantics, depth bounded by game length).  The per-simulation update
    # cost scales with this bound; see MCTSConfig.max_depth
    max_depth: Optional[int] = None
    # TPU implementation knobs (bit-identical results; None = the measured
    # MCTSConfig defaults).  Exposed here so experiments can pin the
    # faster formulation for their tree shapes (see MCTSConfig.stages /
    # MCTSConfig.gather and NOTES.md for the measurements)
    stages: Optional[int] = None
    gather: Optional[str] = None

    def replace(self, **kw) -> "MctsParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """(``src/params.jl:92-101``, TPU-adapted)"""

    num_games: int
    num_lanes: int  # games stepped in lockstep on device
    flip_probability: float = 0.0
    alternate_colors: bool = False
    reset_every: Optional[int] = 1  # no-op, kept for parity

    def replace(self, **kw) -> "SimParams":
        return dataclasses.replace(self, **kw)

    @property
    def num_rounds(self) -> int:
        return max(1, math.ceil(self.num_games / self.num_lanes))


@dataclasses.dataclass(frozen=True)
class ArenaParams:
    """(``src/params.jl:139-143``)"""

    mcts: MctsParams
    sim: SimParams
    update_threshold: float


@dataclasses.dataclass(frozen=True)
class SelfPlayParams:
    """(``src/params.jl:160-163``)"""

    mcts: MctsParams
    sim: SimParams


@dataclasses.dataclass(frozen=True)
class LearningParams:
    """(``src/params.jl:235-248``)"""

    optimiser: OptimiserSpec
    l2_regularization: float
    batch_size: int
    loss_computation_batch_size: int
    min_checkpoints_per_epoch: int
    max_batches_per_checkpoint: int
    num_checkpoints: int
    samples_weighing_policy: str = LOG_WEIGHT
    use_position_averaging: bool = True
    rewards_renormalization: float = 1.0
    nonvalidity_penalty: float = 1.0


@dataclasses.dataclass(frozen=True)
class MemAnalysisParams:
    """(``src/params.jl:273-275``)"""

    num_game_stages: int


@dataclasses.dataclass(frozen=True)
class Params:
    """(``src/params.jl:322-331``)"""

    self_play: SelfPlayParams
    learning: LearningParams
    arena: Optional[ArenaParams]
    num_iters: int
    mem_buffer_size: Schedule
    use_symmetries: bool = False
    ternary_outcome: bool = False
    memory_analysis: Optional[MemAnalysisParams] = None
    # TPU extra: replay capacities are rounded up to a multiple of this to
    # bound the number of distinct compiled learner programs.
    mem_buffer_granularity: int = 1

    def replace(self, **kw) -> "Params":
        return dataclasses.replace(self, **kw)


def necessary_samples(eps: float, beta: float) -> float:
    """Hoeffding sample-size helper (``src/params.jl:352``)."""
    return math.log(1.0 / beta) / (2.0 * eps * eps)


def check_params(game, p: Params) -> Tuple[list, list]:
    """Static consistency checks (``src/params.jl:361-384``, extended:
    the reference validates worker/batch sizing and flip symmetries; the
    TPU design adds symmetry-augmentation, gating-threshold, outcome and
    ring-capacity checks)."""
    errors, warnings = [], []
    mctss = [p.self_play.mcts] + ([p.arena.mcts] if p.arena else [])
    sims = [p.self_play.sim] + ([p.arena.sim] if p.arena else [])
    # the runtime flip path gates on random_symmetry (selfplay.py/arena.py),
    # not symmetrize — validate the field that is actually consulted
    if (any(s.flip_probability != 0 for s in sims)
            and game.random_symmetry is None):
        errors.append("flip_probability > 0 requires game.random_symmetry")
    if p.use_symmetries and (game.symmetrize is None
                             or not game.num_symmetries):
        errors.append("use_symmetries requires game.symmetrize")
    if any(s.num_lanes > s.num_games for s in sims):
        warnings.append("num_lanes > num_games: lanes will be wasted")
    if any(not (0 < m.num_iters_per_turn) for m in mctss):
        errors.append("num_iters_per_turn must be positive")
    if any(m.algorithm not in ("puct", "gumbel") for m in mctss):
        errors.append("mcts.algorithm must be 'puct' or 'gumbel'")
    if any(not (0.0 <= m.dirichlet_noise_eps <= 1.0) for m in mctss):
        errors.append("dirichlet_noise_eps must lie in [0, 1]")
    if any(not (0.0 <= m.gamma <= 1.0) for m in mctss):
        errors.append("mcts.gamma must lie in [0, 1]")
    if p.arena is not None and game.two_players and not (
            -1.0 <= p.arena.update_threshold <= 1.0):
        errors.append("arena.update_threshold must lie in [-1, 1] for"
                      " two-player games")
    if p.ternary_outcome and any(m.gamma != 1.0 for m in mctss):
        warnings.append("ternary_outcome expects undiscounted +-1/0"
                        " rewards; gamma < 1 will misclassify outcomes")
    if p.learning.batch_size > p.mem_buffer_size(0):
        warnings.append("learning batch_size exceeds initial memory size")
    sp = p.self_play.sim
    max_batch = sp.num_lanes * game.max_game_length
    if any(p.mem_buffer_size(i) < max_batch for i in range(p.num_iters)):
        warnings.append(
            f"mem_buffer_size < num_lanes * max_game_length (= {max_batch}):"
            " a single self-play round can overflow the ring; only the"
            " newest samples will be kept")
    return errors, warnings


# ---------------------------------------------------------------------------
# JSON round-trip (equivalent of ``src/ui/json.jl``)
# ---------------------------------------------------------------------------


def _encode(obj):
    if isinstance(obj, (Schedule,)):
        return obj.to_json()
    if isinstance(obj, OptimiserSpec):
        return obj.to_json()
    if dataclasses.is_dataclass(obj):
        return {f.name: _encode(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_encode(x) for x in obj]
    return obj


def params_to_json(p: Params) -> str:
    return json.dumps(_encode(p), indent=2)


def _dec_sched(d):
    return Schedule.from_json(d)


def params_from_json(text: str) -> Params:
    d = json.loads(text)

    def mcts(m):
        m = dict(m)
        m["temperature"] = _dec_sched(m["temperature"])
        return MctsParams(**m)

    def sim(s):
        return SimParams(**s)

    def learning(l):
        l = dict(l)
        l["optimiser"] = OptimiserSpec.from_json(l["optimiser"])
        return LearningParams(**l)

    arena = None
    if d.get("arena"):
        a = d["arena"]
        arena = ArenaParams(mcts=mcts(a["mcts"]), sim=sim(a["sim"]),
                            update_threshold=a["update_threshold"])
    mem = d.get("memory_analysis")
    return Params(
        self_play=SelfPlayParams(mcts=mcts(d["self_play"]["mcts"]),
                                 sim=sim(d["self_play"]["sim"])),
        learning=learning(d["learning"]),
        arena=arena,
        num_iters=d["num_iters"],
        mem_buffer_size=_dec_sched(d["mem_buffer_size"]),
        use_symmetries=d.get("use_symmetries", False),
        ternary_outcome=d.get("ternary_outcome", False),
        memory_analysis=MemAnalysisParams(**mem) if mem else None,
        mem_buffer_granularity=d.get("mem_buffer_granularity", 1),
    )
