"""Mancala experiment config (copied from connect-four, as the reference
does: ``/root/reference/games/mancala/params.jl:1-2``)."""

from __future__ import annotations

import dataclasses

from .. import arena as A
from ..envs import registry as game_registry
from . import Experiment
from .connect_four import experiment as c4_experiment


def experiment(num_lanes: int = 1024) -> Experiment:
    base = c4_experiment(num_lanes=num_lanes)
    game = game_registry()["mancala"]
    # mancala has no symmetries -> no board flips / symmetry augmentation
    params = dataclasses.replace(
        base.params, use_symmetries=False,
        self_play=dataclasses.replace(
            base.params.self_play,
            sim=base.params.self_play.sim.replace(flip_probability=0.0)),
        arena=dataclasses.replace(
            base.params.arena,
            sim=base.params.arena.sim.replace(flip_probability=0.0)))
    # The reference's mancala benchmark copies c4's verbatim, incl. the
    # MctsRollouts-1000 duels.  Mancala's full-length (120-ply) playout
    # scan reproducibly faults this TPU worker at ANY lane count (round-4
    # re-bisect), so the rollout baseline here truncates playouts to the
    # 42-ply envelope with a heuristic (store-difference) bootstrap — see
    # MctsRollouts.max_playout_plies and search.mcts.rollout_oracle; a
    # documented deviation in leaf-value estimation, not in search
    # semantics.  Even truncated, the mancala rollout program's envelope
    # is HALF c4's (round-5 on-chip bisect: 1000 sims x 42 plies runs at
    # 64 lanes, crashes at 128 — the sowing step is that much bigger a
    # program per ply), so the rollout duels run 64 lanes x 2 rounds.
    def _safe(b):
        b = dataclasses.replace(
            b, sim=b.sim.replace(flip_probability=0.0, num_games=128))
        if isinstance(b.baseline, A.MctsRollouts):
            b = dataclasses.replace(
                b,
                baseline=dataclasses.replace(
                    b.baseline,
                    max_playout_plies=A.ROLLOUT_VALIDATED_PLIES),
                sim=b.sim.replace(num_games=128, num_lanes=64,
                                  flip_probability=0.0))
        return b

    benchmark = tuple(_safe(b) for b in base.benchmark)
    return Experiment("mancala", game, params, base.netspec, benchmark)
