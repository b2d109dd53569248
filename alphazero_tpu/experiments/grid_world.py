"""Grid-world experiment config.

Mirrors ``/root/reference/games/grid-world/params.jl``: SimpleNet 100x4,
50-sim greedy MCTS with no noise, constant-weight samples, rewards
renormalized by 10, one-player benchmark Singles.
"""

from __future__ import annotations

from .. import arena as A
from ..config import (ArenaParams, LearningParams, MctsParams, Params,
                      SelfPlayParams, SimParams)
from ..envs import registry as game_registry
from ..models import Adam, SimpleNetSpec
from ..utils.schedules import ConstSchedule
from . import Experiment


def experiment() -> Experiment:
    game = game_registry()["grid-world"]
    netspec = SimpleNetSpec(width=100, depth_common=4, use_batch_norm=False)
    self_play = SelfPlayParams(
        sim=SimParams(num_games=1000, num_lanes=256),
        mcts=MctsParams(
            num_iters_per_turn=50, cpuct=1.0,
            temperature=ConstSchedule(0.0),
            dirichlet_noise_eps=0.0, dirichlet_noise_alpha=1.0))
    arena = ArenaParams(
        sim=SimParams(num_games=100, num_lanes=100, alternate_colors=True),
        mcts=self_play.mcts,
        update_threshold=0.00)
    learning = LearningParams(
        use_position_averaging=False,
        samples_weighing_policy="CONSTANT_WEIGHT",
        rewards_renormalization=10.0,
        l2_regularization=1e-4,
        optimiser=Adam(lr=5e-3),
        batch_size=64, loss_computation_batch_size=2048,
        nonvalidity_penalty=1.0,
        min_checkpoints_per_epoch=1, max_batches_per_checkpoint=5000,
        num_checkpoints=1)
    params = Params(
        arena=arena, self_play=self_play, learning=learning,
        num_iters=5, ternary_outcome=False, use_symmetries=False,
        mem_buffer_size=ConstSchedule(80_000))
    benchmark_sim = SimParams(num_games=500, num_lanes=250)
    benchmark = (
        A.Single(A.Full(self_play.mcts), benchmark_sim),
        A.Single(A.NetworkOnly(), benchmark_sim),
    )
    return Experiment("grid-world", game, params, netspec, benchmark)
