"""Tictactoe experiment config.

Mirrors ``/root/reference/games/tictactoe/params.jl`` with TPU-adapted sim
knobs (``num_lanes`` replaces the worker/batch pair).

Trained quality (sessions/tictactoe, 4 iterations): the argmax policy is
game-theoretically optimal on 99.71% of all 4520 reachable non-terminal
positions and never loses a 400-game duel vs minmax-depth-6 at tau 0/0.3
(0W/400D/0L); the benchmark row's 16% NetworkOnly loss rate is exactly
the tau=1.0 sampling protocol's floor — see ``scripts/ttt_audit.py`` and
NOTES.md round 5.
"""

from __future__ import annotations

from .. import arena as A
from ..config import (ArenaParams, LearningParams, MctsParams,
                      MemAnalysisParams, Params, SelfPlayParams, SimParams)
from ..envs import registry as game_registry
from ..models import CyclicNesterov, SimpleNetSpec
from ..utils.schedules import ConstSchedule
from . import Experiment


def experiment() -> Experiment:
    game = game_registry()["tictactoe"]
    # value_init_gain=5: init value-head RMS ~0.37 (measured), giving the
    # iteration-1 search a decisive, learnable Q signal — same mechanism as
    # the connect-four flagship (see experiments/connect_four.py and
    # models/interface.kernel_initializer)
    netspec = SimpleNetSpec(
        width=200, depth_common=6, use_batch_norm=True,
        batch_norm_momentum=1.0, value_init_gain=5.0)
    self_play = SelfPlayParams(
        sim=SimParams(num_games=1000, num_lanes=256),
        mcts=MctsParams(
            num_iters_per_turn=400, cpuct=1.0,
            temperature=ConstSchedule(1.0),
            dirichlet_noise_eps=0.2, dirichlet_noise_alpha=1.0))
    arena = ArenaParams(
        sim=SimParams(num_games=100, num_lanes=100, flip_probability=0.5,
                      alternate_colors=True),
        mcts=self_play.mcts.replace(
            temperature=ConstSchedule(0.3), dirichlet_noise_eps=0.1),
        update_threshold=0.00)
    learning = LearningParams(
        samples_weighing_policy="LOG_WEIGHT",
        l2_regularization=1e-4,
        optimiser=CyclicNesterov(
            lr_base=1e-3, lr_high=1e-2, lr_low=1e-3,
            momentum_high=0.9, momentum_low=0.8),
        batch_size=32, loss_computation_batch_size=2048,
        nonvalidity_penalty=1.0,
        min_checkpoints_per_epoch=0, max_batches_per_checkpoint=5000,
        num_checkpoints=1)
    params = Params(
        arena=arena, self_play=self_play, learning=learning,
        num_iters=4, ternary_outcome=True, use_symmetries=True,
        memory_analysis=MemAnalysisParams(num_game_stages=4),
        mem_buffer_size=ConstSchedule(80_000))
    benchmark_sim = SimParams(num_games=400, num_lanes=200,
                              flip_probability=0.5, alternate_colors=True)
    benchmark = (
        A.Duel(A.Full(self_play.mcts), A.MctsRollouts(self_play.mcts),
               benchmark_sim),
        A.Duel(A.NetworkOnly(),
               A.MinMaxTS(depth=6, amplify_rewards=True, tau=1.0),
               benchmark_sim),
    )
    return Experiment("tictactoe", game, params, netspec, benchmark)
