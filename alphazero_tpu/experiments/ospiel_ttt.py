"""OpenSpiel tictactoe experiment (``/root/reference/games/ospiel_ttt``).

Demonstrates training through the OpenSpiel bridge: the C++ game is
tabulated once into transition tensors (``envs/external.py``) and then runs
fully on-device like any native game.  Registered only when ``pyspiel`` is
importable (the reference loads its OpenSpiel wrapper lazily too,
``src/AlphaZero.jl:180-188``).

Config mirrors ``games/ospiel_ttt/params.jl``: SimpleNet 200x6, 400-sim
MCTS, no symmetries (the bridge exposes none).
"""

from __future__ import annotations

from .. import arena as A
from ..config import (ArenaParams, LearningParams, MctsParams, Params,
                      SelfPlayParams, SimParams)
from ..envs.external import openspiel_game
from ..models import Adam, SimpleNetSpec
from ..utils.schedules import ConstSchedule
from . import Experiment


def experiment() -> Experiment:
    game = openspiel_game("tic_tac_toe")
    netspec = SimpleNetSpec(width=200, depth_common=6, use_batch_norm=True,
                            batch_norm_momentum=1.0)
    self_play = SelfPlayParams(
        sim=SimParams(num_games=1000, num_lanes=256),
        mcts=MctsParams(
            num_iters_per_turn=400, cpuct=1.0,
            temperature=ConstSchedule(1.0),
            dirichlet_noise_eps=0.2, dirichlet_noise_alpha=1.0))
    arena = ArenaParams(
        sim=SimParams(num_games=100, num_lanes=100, alternate_colors=True),
        mcts=self_play.mcts.replace(
            temperature=ConstSchedule(0.3), dirichlet_noise_eps=0.1),
        update_threshold=0.00)
    learning = LearningParams(
        samples_weighing_policy="LOG_WEIGHT",
        l2_regularization=1e-4,
        optimiser=Adam(lr=5e-3),
        batch_size=32, loss_computation_batch_size=2048,
        nonvalidity_penalty=1.0,
        min_checkpoints_per_epoch=0, max_batches_per_checkpoint=5000,
        num_checkpoints=1)
    params = Params(
        arena=arena, self_play=self_play, learning=learning,
        num_iters=3, ternary_outcome=True, use_symmetries=False,
        mem_buffer_size=ConstSchedule(80_000))
    benchmark_sim = SimParams(num_games=400, num_lanes=200,
                              alternate_colors=True)
    benchmark = (
        A.Duel(A.Full(self_play.mcts),
               A.MctsRollouts(self_play.mcts), benchmark_sim),
        A.Duel(A.NetworkOnly(), A.MctsRollouts(self_play.mcts),
               benchmark_sim),
    )
    return Experiment("ospiel-ttt", game, params, netspec, benchmark)
