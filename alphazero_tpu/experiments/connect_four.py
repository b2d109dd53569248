"""Connect-four flagship experiment config.

Mirrors ``/root/reference/games/connect-four/params.jl``: ResNet 5x128,
600-sim MCTS, 5000 self-play games/iter, replay 400K -> 1M, Adam 2e-3,
128-game gating arena at threshold 0.05, benchmark duels vs
MctsRollouts(1000) and MinMax(depth 5).
"""

from __future__ import annotations

from .. import arena as A
from ..config import (ArenaParams, LearningParams, MctsParams, Params,
                      SelfPlayParams, SimParams)
from ..envs import registry as game_registry
from ..models import Adam, ResNetSpec
from ..utils.schedules import ConstSchedule, PLSchedule
from . import Experiment


def experiment(num_lanes: int = 1024) -> Experiment:
    game = game_registry()["connect-four"]
    # value_init_gain reproduces the reference's measured INIT value-head
    # statistics (value RMS ~0.45; derived from
    # ``docs/src/assets/img/ui-first-iter.png``: learning-start Lv=1.024 >
    # E[z^2] — see models/interface.kernel_initializer).  A decisive random
    # VALUE function is load-bearing for the takeoff: it makes iteration-1
    # search Q-driven and its targets a consistent, learnable function
    # instead of noise (round-4 probes; measured session Hp 1.78 -> 1.36).
    # The policy head keeps gain 1: the reference's own learning-start CE
    # (Lp+Hp = 2.15 > ln 7) shows its init priors DISAGREE with its targets
    # — prior tilt is not the driver, and gains >~2 explode the initial CE
    # (observed: loss 7 -> nan in 4 Adam steps at gain 4).
    netspec = ResNetSpec(
        num_filters=128, num_blocks=5, conv_kernel_size=(3, 3),
        num_policy_head_filters=32, num_value_head_filters=32,
        batch_norm_momentum=0.1,
        init_scheme="flux", policy_init_gain=1.0, value_init_gain=3.0)
    self_play = SelfPlayParams(
        sim=SimParams(num_games=5000, num_lanes=num_lanes),
        mcts=MctsParams(
            num_iters_per_turn=600, cpuct=2.0, prior_temperature=1.0,
            temperature=PLSchedule([0, 20, 30], [1.0, 1.0, 0.3]),
            dirichlet_noise_eps=0.25, dirichlet_noise_alpha=1.0,
            # mctx-style descent-depth cap for SELF-PLAY only; 16 is
            # strength-neutral at equal 600-sim budget (+0.023 avgr,
            # 117/28/111 over 256 games; md20 +0.031, md24 +0.031 —
            # scripts/ablations.py --ablation depth, trained flagship net)
            max_depth=16))
    arena = ArenaParams(
        sim=SimParams(num_games=128, num_lanes=128, flip_probability=0.5,
                      alternate_colors=True),
        # arena/benchmark players keep exact reference search semantics
        # (no depth cap)
        mcts=self_play.mcts.replace(
            temperature=ConstSchedule(0.2), dirichlet_noise_eps=0.05,
            max_depth=None),
        update_threshold=0.05)
    learning = LearningParams(
        samples_weighing_policy="LOG_WEIGHT",
        use_position_averaging=True,
        l2_regularization=1e-4,
        optimiser=Adam(lr=2e-3),
        batch_size=1024, loss_computation_batch_size=1024,
        nonvalidity_penalty=1.0,
        min_checkpoints_per_epoch=1,
        max_batches_per_checkpoint=2000,
        num_checkpoints=1)
    params = Params(
        arena=arena, self_play=self_play, learning=learning,
        num_iters=15, ternary_outcome=True, use_symmetries=True,
        mem_buffer_size=PLSchedule([0, 15], [400_000, 1_000_000]),
        mem_buffer_granularity=50_000)
    # 128 lanes x 2 rounds: the 256-lane duel program reproducibly kills the
    # TPU worker with a kernel fault (axon tunnel, jax 0.8.x) while 128
    # lanes are stable; see NOTES.md.  alternate_colors=False matches the
    # reference's benchmark protocol exactly (the evaluated player always
    # moves first; ``games/connect-four/params.jl:96-100``) — the gating
    # arena above keeps alternate_colors=True as the reference's arena does.
    benchmark_sim = SimParams(num_games=256, num_lanes=128,
                              flip_probability=0.5, alternate_colors=False)
    mcts_baseline = A.MctsRollouts(
        arena.mcts.replace(num_iters_per_turn=1000, cpuct=1.0))
    minmax_baseline = A.MinMaxTS(depth=5, amplify_rewards=True, tau=0.2)
    alphazero_player = A.Full(arena.mcts)
    network_player = A.NetworkOnly(tau=0.5)
    benchmark = (
        A.Duel(alphazero_player, mcts_baseline, benchmark_sim),
        A.Duel(alphazero_player, minmax_baseline, benchmark_sim),
        A.Duel(network_player, mcts_baseline, benchmark_sim),
        A.Duel(network_player, minmax_baseline, benchmark_sim),
    )
    return Experiment("connect-four", game, params, netspec, benchmark)


def gumbel_experiment(num_lanes: int = 1024) -> Experiment:
    """The Gumbel sequential-halving recipe (an extension beyond the
    reference; Danihelka et al. 2022, search/gumbel.py): the flagship
    config with ``algorithm="gumbel"`` at 150 sims for BOTH self-play and
    the gating arena, benchmarks unchanged (reference protocol players).

    Measured on one v5e chip (sessions/c4-gumbel-r4 — the post-init-fix
    retrain against canary-validated baselines; NOTES.md round 5):
    self-play at ~1500 samples/s (2.6x the 600-sim PUCT rate), all 15
    iterations with benchmarks in ~80 min wall; 512-game
    reference-protocol final eval 99.8% +- 0.4% vs MinMax-5 and
    99.2% +- 0.8% vs MctsRollouts(1000), raw NetworkOnly 86.9% / 88.9%
    (final_eval_refproto.json) — PUCT-flagship strength at ~2.8x less
    search compute per move.
    Arena semantics: the gating duel uses gumbel search on both sides (the
    halving argmax is the played move, no temperature), while benchmark
    duels keep the reference's exact PUCT evaluation players.
    """
    base = experiment(num_lanes)
    gumbel_mcts = lambda m: m.replace(
        algorithm="gumbel", num_iters_per_turn=150, max_depth=None)
    import dataclasses
    p = base.params
    params = dataclasses.replace(
        p,
        self_play=dataclasses.replace(
            p.self_play, mcts=gumbel_mcts(p.self_play.mcts)),
        arena=dataclasses.replace(p.arena, mcts=gumbel_mcts(p.arena.mcts)))
    return dataclasses.replace(base, name="connect-four-gumbel",
                               params=params)
