"""Experiment bundles: (game, params, network, benchmark), by name.

Re-design of ``/root/reference/src/experiments.jl`` and the examples registry
``/root/reference/src/examples.jl:17-30``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

from ..config import Params
from ..envs.core import Game
from ..models.interface import NetworkSpec


@dataclasses.dataclass(frozen=True)
class Experiment:
    """(``src/experiments.jl:26-33``)"""

    name: str
    game: Game
    params: Params
    netspec: NetworkSpec
    benchmark: Sequence = ()


def registry():
    from . import tictactoe, connect_four
    exps = [tictactoe.experiment(), connect_four.experiment(),
            connect_four.gumbel_experiment()]
    try:
        from . import mancala
        exps.append(mancala.experiment())
    except ImportError:
        pass
    try:
        from . import grid_world
        exps.append(grid_world.experiment())
    except ImportError:
        pass
    try:
        from . import ospiel_ttt
        exps.append(ospiel_ttt.experiment())
    except ImportError:  # pyspiel is optional (lazy, like the reference)
        pass
    return {e.name: e for e in exps}


def dummy_run_experiment(e: Experiment) -> Experiment:
    """Shrink every size knob to a minimum for pipeline smoke-tests
    (``src/scripts/dummy_run.jl:8-55``)."""
    p = e.params
    tiny_sim = lambda s: s.replace(num_games=2, num_lanes=2)
    tiny_mcts = lambda m: m.replace(num_iters_per_turn=2)
    sp = dataclasses.replace(p.self_play, sim=tiny_sim(p.self_play.sim),
                             mcts=tiny_mcts(p.self_play.mcts))
    arena = None
    if p.arena is not None:
        arena = dataclasses.replace(
            p.arena, sim=tiny_sim(p.arena.sim), mcts=tiny_mcts(p.arena.mcts))
    learning = dataclasses.replace(
        p.learning, batch_size=4, loss_computation_batch_size=4,
        max_batches_per_checkpoint=2, min_checkpoints_per_epoch=0,
        num_checkpoints=1)
    from ..utils.schedules import ConstSchedule
    params = dataclasses.replace(
        p, self_play=sp, arena=arena, learning=learning, num_iters=2,
        mem_buffer_size=ConstSchedule(200))

    def tiny_player(spec):
        from .. import arena as A
        if isinstance(spec, (A.Full, A.MctsRollouts)):
            return dataclasses.replace(spec, mcts=tiny_mcts(spec.mcts))
        if isinstance(spec, A.MinMaxTS):
            return dataclasses.replace(spec, depth=min(spec.depth, 2))
        return spec

    bench = [dataclasses.replace(
        b, sim=tiny_sim(b.sim), player=tiny_player(b.player),
        **({"baseline": tiny_player(b.baseline)}
           if hasattr(b, "baseline") else {}))
        for b in e.benchmark]
    return dataclasses.replace(e, params=params, benchmark=tuple(bench))


def mesh_smoke_experiment() -> Experiment:
    """A small-but-shardable tictactoe config (16 lanes, arena on): the
    shared fixture for the simulated-mesh parity tests (tests/test_parallel)
    and the 2-process multi-controller smoke (scripts/multiproc_smoke)."""
    exp = dummy_run_experiment(registry()["tictactoe"])
    resize = lambda s: s.replace(num_games=16, num_lanes=16)
    p = exp.params
    params = dataclasses.replace(
        p,
        self_play=dataclasses.replace(p.self_play,
                                      sim=resize(p.self_play.sim)),
        arena=dataclasses.replace(p.arena, sim=resize(p.arena.sim)),
        learning=dataclasses.replace(p.learning, batch_size=16,
                                     loss_computation_batch_size=16))
    return dataclasses.replace(exp, params=params, benchmark=())
