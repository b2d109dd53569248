"""High-level training orchestration: the AlphaZero iteration loop.

Re-design of ``/root/reference/src/training.jl``.  The host-side loop
structure (iterate: self-play → memory report → learning with checkpoint
arenas and gating) is preserved exactly, including the Handlers callback
decoupling (``training.jl:48-94``) that lets the UI live in a separate layer.
All heavy work inside each phase runs as cached jitted device programs.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import arena as arenamod
from . import config as cfgmod
from . import learning as learnmod
from . import memory as memmod
from . import report as R
from . import selfplay as spmod
from .envs.core import Game
from .models.interface import NetState, Network, NetworkSpec
from .search import mcts


class Handlers:
    """Training callbacks (``training.jl:48-94``).  Subclass and override."""

    def iteration_started(self, env): pass
    def self_play_started(self, env): pass
    def game_played(self, env, reward=None): pass
    def self_play_finished(self, env, report): pass
    def memory_analyzed(self, env, report): pass
    def learning_started(self, env): pass
    def updates_started(self, env, status): pass
    def updates_finished(self, env, status): pass
    def checkpoint_started(self, env): pass
    def checkpoint_game_played(self, env): pass
    def checkpoint_finished(self, env, report): pass
    def learning_finished(self, env, report): pass
    def iteration_finished(self, env, report): pass
    def training_finished(self, env): pass


@dataclasses.dataclass
class AZEnv:
    """The training environment (``Env``, ``training.jl:27-42``): current and
    best network states, replay memory, iteration counter.

    ``mesh`` (optional, not checkpointed) makes every phase of the loop run
    SPMD over the mesh's ``data`` axis: self-play lanes, the replay buffer,
    learner minibatches and arena lanes are sharded; network parameters are
    replicated.  The reference distributes only self-play, by shipping
    closures to worker processes (``src/simulations.jl:252-290``); here the
    ONE jitted program per phase is partitioned by GSPMD, and under a
    multi-host runtime (``parallel.distributed``) the same host loop runs
    unchanged on every host.
    """

    game: Game
    netspec: NetworkSpec
    params: cfgmod.Params
    curnn: NetState
    bestnn: NetState
    replay: memmod.Replay
    itc: int = 0
    rng: Any = None
    mesh: Any = None

    @staticmethod
    def create(game: Game, netspec: NetworkSpec, params: cfgmod.Params,
               seed: int = 0, mesh=None) -> "AZEnv":
        rng = jax.random.key(seed)
        rng, init_key = jax.random.split(rng)
        net = Network(game, netspec).init(init_key)
        cap = _round_capacity(params, params.mem_buffer_size(0))
        env = AZEnv(game=game, netspec=netspec, params=params, curnn=net,
                    bestnn=net, replay=memmod.init_replay(game, cap),
                    rng=rng, mesh=mesh)
        env.commit_to_mesh()
        return env

    def commit_to_mesh(self) -> None:
        """Place the env's device state onto the mesh: networks replicated,
        replay sharded over ``data`` along its capacity axis.  No-op without
        a mesh (single-chip layout)."""
        if self.mesh is None:
            return
        from . import parallel
        self.curnn = parallel.put_replicated(self.mesh, self.curnn)
        self.bestnn = parallel.put_replicated(self.mesh, self.bestnn)
        self.replay = parallel.put_data_sharded(self.mesh, self.replay, 0)

    def next_key(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    @property
    def network(self) -> Network:
        return Network(self.game, self.netspec)


def _round_capacity(params: cfgmod.Params, n: int) -> int:
    g = max(1, params.mem_buffer_granularity)
    return ((int(n) + g - 1) // g) * g


def initial_report(env: AZEnv) -> R.Initial:
    """(``training.jl:113-121``)"""
    net = env.network
    nparams = net.num_parameters(env.curnn)
    errors, warnings = cfgmod.check_params(env.game, env.params)
    sp = env.params.self_play
    footprint = spmod.tree_memory_footprint(
        env.game, arenamod.mcts_config(sp.mcts), sp.sim.num_lanes)
    per_node = footprint // max(
        sp.sim.num_lanes * (sp.mcts.num_iters_per_turn + 1), 1)
    return R.Initial(
        num_network_parameters=nparams,
        num_network_regularized_parameters=nparams,
        mcts_footprint_per_node=per_node,
        errors=errors, warnings=warnings)


# ---------------------------------------------------------------------------
# Self-play phase
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _selfplay_program(game: Game, netspec: NetworkSpec,
                      p: cfgmod.MctsParams, num_lanes: int,
                      flip_probability: float, mesh=None):
    network = Network(game, netspec.inference_spec())
    cfg = arenamod.mcts_config(p)

    def fwd(net: NetState, states, obs, mask):
        pol, _, v, _ = network.forward_normalized(net, obs, mask)
        return pol, v

    # segmented dispatches: one fused 42-move program runs minutes per
    # dispatch at flagship size and crashes the TPU worker (NOTES.md)
    return spmod.make_segmented_self_play(
        game, fwd, cfg, p.temperature, num_lanes,
        flip_probability=flip_probability, mesh=mesh)


def self_play_step(env: AZEnv, handlers: Handlers) -> R.SelfPlay:
    """(``training.jl:275-300``)"""
    p = env.params.self_play
    handlers.self_play_started(env)
    run = _selfplay_program(env.game, env.netspec, p.mcts, p.sim.num_lanes,
                            p.sim.flip_probability, env.mesh)
    env.replay = memmod.new_batch(env.replay)
    t0 = time.perf_counter()
    total_moves = 0
    depth_sum, sims_sum = 0, 0
    def on_progress(n, rewards=None):
        # one callback per completed game with its white-POV measurement
        # (``simulations.jl:258-266``), delivered at segment-dispatch
        # granularity
        for i in range(n):
            handlers.game_played(
                env, reward=None if rewards is None else float(rewards[i]))

    for _ in range(p.sim.num_rounds):
        tb = run(env.bestnn, env.next_key(), on_progress)
        env.replay = _push_program(env.game, env.replay.capacity, env.mesh)(
            env.replay, tb)
        total_moves += int(jax.jit(jnp.sum)(tb.num_moves))
        depth_sum += int(tb.nodes_traversed)
        sims_sum += int(tb.num_sims)
    jax.block_until_ready(env.replay.ptr)
    elapsed = time.perf_counter() - t0
    report = R.SelfPlay(
        samples_gen_speed=total_moves / max(elapsed, 1e-9),
        average_exploration_depth=depth_sum / max(sims_sum, 1),
        mcts_memory_footprint=spmod.tree_memory_footprint(
            env.game, arenamod.mcts_config(p.mcts), p.sim.num_lanes),
        memory_size=int(env.replay.size),
        memory_num_distinct_boards=int(
            memmod.num_distinct_boards(env.game, env.replay)),
    )
    handlers.self_play_finished(env, report)
    return report


@functools.lru_cache(maxsize=32)
def _push_program(game: Game, capacity: int, mesh=None):
    @jax.jit
    def doit(replay: memmod.Replay, tb: spmod.TraceBatch):
        out = memmod.push(replay, tb.states, tb.pi, tb.z, tb.t, tb.key,
                          tb.valid)
        if mesh is not None:
            # keep the ring sharded over data across iterations (the
            # scatter would otherwise inherit whatever GSPMD picked)
            from . import parallel
            out = out._replace(
                states=parallel.shard_axis(mesh, out.states, 0),
                pi=parallel.shard_axis(mesh, out.pi, 0),
                z=parallel.shard_axis(mesh, out.z, 0),
                t=parallel.shard_axis(mesh, out.t, 0),
                key=parallel.shard_axis(mesh, out.key, 0))
        return out
    return doit


# ---------------------------------------------------------------------------
# Network comparison / gating
# ---------------------------------------------------------------------------


def compare_networks(env: AZEnv, contender: NetState, baseline: NetState,
                     handlers: Handlers) -> R.Evaluation:
    """Contender vs baseline under arena params (``training.jl:159-174``)."""
    from .parallel import to_host
    ap = env.params.arena
    spec = arenamod.Full(ap.mcts)
    t0 = time.perf_counter()
    if env.game.two_players:
        res = arenamod.play_duel(
            env.game, env.netspec, spec, spec, ap.sim, contender, baseline,
            env.next_key(), gamma=ap.mcts.gamma, mesh=env.mesh)
        handlers.checkpoint_game_played(env)
        rewards = to_host(res.rewards)
        avgr = float(rewards.mean())
        baseline_rewards = None
        red = float(to_host(res.redundancy))
    else:
        res_c = arenamod.play_duel(
            env.game, env.netspec, spec, None, ap.sim, contender, contender,
            env.next_key(), gamma=ap.mcts.gamma, mesh=env.mesh)
        res_b = arenamod.play_duel(
            env.game, env.netspec, spec, None, ap.sim, baseline, baseline,
            env.next_key(), gamma=ap.mcts.gamma, mesh=env.mesh)
        rewards = to_host(res_c.rewards)
        b_rewards = to_host(res_b.rewards)
        baseline_rewards = list(map(float, b_rewards))
        avgr = float(rewards.mean() - b_rewards.mean())
        red = float(to_host(res_c.redundancy)
                    + to_host(res_b.redundancy)) / 2
    return R.Evaluation(
        legend="Most recent NN versus best NN so far",
        avgr=avgr, redundancy=red,
        rewards=list(map(float, rewards)),
        baseline_rewards=baseline_rewards,
        time=time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Learning phase
# ---------------------------------------------------------------------------


def _dummy_learning_report() -> R.Learning:
    """(``training.jl:186-191``)"""
    eps = 1e-16
    status = R.LearningStatus(R.Loss(0, 0, 0, 0, 0), 0, 0)
    return R.Learning(eps, eps, eps, eps, status, [], [], False)


def learning_step(env: AZEnv, handlers: Handlers) -> R.Learning:
    """(``training.jl:193-259``)"""
    ap, lp = env.params.arena, env.params.learning
    if int(env.replay.size) == 0:
        return _dummy_learning_report()
    checkpoints: List[R.Checkpoint] = []
    losses: List[float] = []
    tloss = teval = ttrain = 0.0
    t0 = time.perf_counter()
    trainer = learnmod.Trainer(
        env.game, env.netspec, env.curnn, env.replay, lp,
        use_symmetries=env.params.use_symmetries, rng=env.next_key(),
        mesh=env.mesh)
    tconvert = time.perf_counter() - t0
    init_status = trainer.learning_status()
    status = init_status
    handlers.learning_started(env)
    nbatches = trainer.batches_per_checkpoint()
    best_evalr = ap.update_threshold if ap is not None else None
    nn_replaced = False

    for k in range(1, lp.num_checkpoints + 1):
        handlers.updates_started(env, status)
        t0 = time.perf_counter()
        dlosses = trainer.batch_updates(nbatches)
        jax.block_until_ready(trainer.state.net.params)
        ttrain += time.perf_counter() - t0
        t0 = time.perf_counter()
        status = trainer.learning_status()
        tloss += time.perf_counter() - t0
        handlers.updates_finished(env, status)
        losses.extend(map(float, dlosses))
        env.curnn = trainer.state.net
        if ap is None:
            env.bestnn = env.curnn
            nn_replaced = True
        else:
            handlers.checkpoint_started(env)
            eval_report = compare_networks(env, env.curnn, env.bestnn,
                                           handlers)
            teval += eval_report.time
            success = eval_report.avgr >= best_evalr
            if success:
                nn_replaced = True
                env.bestnn = env.curnn
                best_evalr = eval_report.avgr
            ckpt = R.Checkpoint(batch_id=k * nbatches,
                                evaluation=eval_report,
                                status_after_update=status,
                                nn_replaced=success)
            checkpoints.append(ckpt)
            handlers.checkpoint_finished(env, ckpt)

    report = R.Learning(
        time_convert=tconvert, time_loss=tloss, time_train=ttrain,
        time_eval=teval, initial_status=init_status, losses=losses,
        checkpoints=checkpoints, nn_replaced=nn_replaced)
    handlers.learning_finished(env, report)
    return report


# ---------------------------------------------------------------------------
# Memory analysis
# ---------------------------------------------------------------------------


def _replay_subset_program(env):
    """Jitted subset gather ``(replay, idx[cap], m) -> Replay`` whose first
    ``m`` rows are ``replay[idx[:m]]`` and the rest zeros.

    Routed through jit with replicated outputs because eager fancy-indexing
    on a (possibly mesh-sharded, multi-process) replay either becomes an
    ad-hoc collective or fails on non-addressable arrays — the same rule
    every sibling path follows (``learning.py`` dataset builder,
    ``arena.py`` duel outputs)."""
    cap = env.replay.capacity

    def prog(replay, idx, m):
        valid = jnp.arange(cap) < m

        def take(src):
            g = jnp.take(src, idx, axis=0)
            vs = valid.reshape((-1,) + (1,) * (g.ndim - 1))
            return jnp.where(vs, g, jnp.zeros_like(g))

        return replay._replace(
            states=jax.tree.map(take, replay.states),
            pi=take(replay.pi), z=take(replay.z), t=take(replay.t),
            key=take(replay.key),
            ptr=(m % cap).astype(jnp.int32), total=m.astype(jnp.int32),
            cur_batch=m.astype(jnp.int32))

    if env.mesh is not None:
        from .parallel import replicated
        return jax.jit(prog, out_shardings=replicated(env.mesh))
    return jax.jit(prog)


def memory_report(env: AZEnv, handlers: Handlers) -> Optional[R.Memory]:
    """(``training.jl:302-311``, ``learning.jl:191-216``)"""
    mp = env.params.memory_analysis
    if mp is None:
        return None
    lp = env.params.learning

    def report_for(replay) -> R.Samples:
        tr = learnmod.Trainer(env.game, env.netspec, env.curnn, replay, lp,
                              use_symmetries=False, rng=env.next_key(),
                              mesh=env.mesh)
        return tr.samples_report()

    cap = env.replay.capacity
    subset = _replay_subset_program(env)

    def subset_replay(idx: np.ndarray):
        idx_full = np.zeros(cap, np.int32)
        idx_full[:len(idx)] = idx
        return subset(env.replay, jnp.asarray(idx_full),
                      jnp.asarray(len(idx), jnp.int32))

    all_samples = report_for(env.replay)
    # latest self-play batch (replicated scalars: eager int() is safe)
    nlast = int(jnp.minimum(env.replay.cur_batch, env.replay.size))
    if nlast > 0:
        idx = (int(env.replay.ptr) - nlast + np.arange(nlast)) % cap
        latest = report_for(subset_replay(idx))
    else:
        latest = all_samples
    # per-game-stage buckets over t (remaining moves): sort by t, then
    # ceil-size chunks exactly as the reference partitions
    # (``learning.jl:206-208``: csize = ceil(len/num); last chunk smaller)
    from .parallel import to_host
    size = int(env.replay.size)
    ts = to_host(env.replay.t)[:size]  # host gather (collective under mesh)
    order = np.argsort(ts, kind="stable")
    stages: List[R.StageSamples] = []
    nstages = min(mp.num_game_stages, max(size, 1))
    csize = -(-len(order) // nstages)
    for chunk in [order[i:i + csize] for i in range(0, len(order), csize)]:
        if len(chunk) == 0:
            continue
        stages.append(R.StageSamples(
            min_remaining_length=float(ts[chunk].min()),
            max_remaining_length=float(ts[chunk].max()),
            samples_stats=report_for(subset_replay(chunk))))
    rep = R.Memory(latest_batch=latest, all_samples=all_samples,
                   per_game_stage=stages)
    handlers.memory_analyzed(env, rep)
    return rep


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------


def resize_memory(env: AZEnv, n: int) -> None:
    """(``training.jl:180-184``)"""
    cap = _round_capacity(env.params, n)
    if cap != env.replay.capacity:
        env.replay = memmod.resize(env.game, env.replay, cap)
        if env.mesh is not None:
            from . import parallel
            env.replay = parallel.put_data_sharded(env.mesh, env.replay, 0)


def train(env: AZEnv, handlers: Optional[Handlers] = None) -> None:
    """Run the training loop until ``num_iters`` (``training.jl:321-333``)."""
    handlers = handlers or Handlers()
    while env.itc < env.params.num_iters:
        handlers.iteration_started(env)
        resize_memory(env, env.params.mem_buffer_size(env.itc))
        with R.timed() as t_sp:
            sprep = self_play_step(env, handlers)
        with R.timed() as t_mem:
            mrep = memory_report(env, handlers)
        with R.timed() as t_learn:
            lrep = learning_step(env, handlers)
        rep = R.Iteration(
            perfs_self_play=t_sp.perfs,
            perfs_memory_analysis=t_mem.perfs,
            perfs_learning=t_learn.perfs,
            self_play=sprep, memory=mrep, learning=lrep)
        env.itc += 1
        handlers.iteration_finished(env, rep)
    handlers.training_finished(env)
