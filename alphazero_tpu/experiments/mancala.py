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
    benchmark = tuple(
        dataclasses.replace(b, sim=b.sim.replace(flip_probability=0.0))
        for b in base.benchmark
        if not isinstance(b.baseline, A.MinMaxTS) or True)
    return Experiment("mancala", game, params, base.netspec, benchmark)
