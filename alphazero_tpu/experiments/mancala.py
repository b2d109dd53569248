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
    # Divergence from the reference benchmark set (which copies c4's,
    # incl. MctsRollouts-1000): mancala ROLLOUT-oracle duel programs
    # reproducibly fault the TPU worker — at the c4-safe 1000x128 shape
    # AND at 32 lanes under the ply-scaled guard (round 4) — the same
    # environmental fault family as repro_duel256.py; its 120-ply
    # rollout-to-the-end leaf scans over the sowing loop are a far bigger
    # program than c4's.  Network-search and minmax duel programs are
    # clean, so the benchmark keeps the MinMaxTS duels (128 games).
    benchmark = tuple(
        dataclasses.replace(b, sim=b.sim.replace(flip_probability=0.0,
                                                 num_games=128))
        for b in base.benchmark
        if isinstance(b.baseline, A.MinMaxTS))
    return Experiment("mancala", game, params, base.netspec, benchmark)
