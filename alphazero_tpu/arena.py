"""Jitted game evaluation: duels, arena gating, benchmark players.

Re-design of the reference's evaluation machinery:

* ``Benchmark.Player`` specs (``src/benchmark.jl:126-194``) become small
  frozen dataclasses whose ``make_think`` builds a jittable batched policy
  function ``(net, states, turn, rng) -> pi_sample``.
* ``pit_networks`` / ``Benchmark.run``'s async duel simulation
  (``src/training.jl:130-143``, ``src/benchmark.jl:78-99``) becomes one
  jitted program playing ``num_lanes`` games in lockstep; the reference's
  two-network inference server (``src/simulations.jl:70-99``) is replaced by
  evaluating both policy functions each turn and selecting per lane by
  who-is-to-move.
* Color alternation flips the contender's color on odd lanes
  (``src/simulations.jl:223-230``) and rewards are reported from the
  contender's POV (``src/simulations.jl:297-307``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfgmod
from . import memory as memmod
from .envs import core as envcore
from .envs.core import Game
from .minmax import MinMaxPlayer
from .models.interface import NetState, Network, NetworkSpec
from .search import gumbel, mcts
from .utils.schedules import ConstSchedule


def mcts_config(p: cfgmod.MctsParams):
    """Build the search config from params; dispatches on ``p.algorithm``."""
    if p.algorithm == "gumbel":
        return gumbel.GumbelConfig(
            num_sims=p.num_iters_per_turn,
            max_considered=p.gumbel_max_considered,
            c_visit=p.gumbel_c_visit,
            c_scale=p.gumbel_c_scale,
            gamma=p.gamma,
            prior_temperature=p.prior_temperature,
            max_depth=p.max_depth,
        )
    extra = {}
    if p.stages is not None:
        extra["stages"] = p.stages
    if p.gather is not None:
        extra["gather"] = p.gather
    return mcts.MCTSConfig(
        num_sims=p.num_iters_per_turn,
        gamma=p.gamma,
        cpuct=p.cpuct,
        dirichlet_eps=p.dirichlet_noise_eps,
        dirichlet_alpha=p.dirichlet_noise_alpha,
        prior_temperature=p.prior_temperature,
        reuse_tree=p.reuse_tree,
        reuse_cap=p.reuse_cap,
        max_depth=p.max_depth,
        **extra,
    )


def run_search(game: Game, oracle, states, rng, cfg):
    """Dispatch to the configured search; returns an object with
    ``policy`` / ``root_visits`` / ``root_q`` / ``nodes_traversed`` and,
    for Gumbel, a recommended ``action``."""
    if isinstance(cfg, gumbel.GumbelConfig):
        return gumbel.search(game, oracle, states, rng, cfg)
    return mcts.search(game, oracle, states, rng, cfg)


def search_pi_sample(game: Game, oracle, states, rng, cfg, tau):
    """Action-selection distribution for a move: temperature-annealed visit
    policy for PUCT (``src/play.jl:48-53``), one-hot halving argmax for
    Gumbel (the policy-improvement guarantee plays the argmax)."""
    res = run_search(game, oracle, states, rng, cfg)
    if isinstance(cfg, gumbel.GumbelConfig):
        return jax.nn.one_hot(res.action, game.num_actions)
    return envcore.apply_temperature(res.policy, tau)


class PlayerSpec:
    """A declarative player: builds a batched think function.

    ``make_think(game, netspec)`` returns ``(think, uses_network)`` where
    ``think(net, states, turn, rng) -> pi_sample`` is jit-compatible.
    """

    def make_think(self, game: Game, netspec: Optional[NetworkSpec]):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Full(PlayerSpec):
    """Full AlphaZero player: net + MCTS (``Benchmark.Full``,
    ``src/benchmark.jl:167-176``)."""

    mcts: cfgmod.MctsParams

    def make_think(self, game, netspec):
        network = Network(game, netspec.inference_spec())
        cfg = mcts_config(self.mcts)

        def think(net, states, turn, rng):
            def oracle(sts, obs, mask):
                p, _, v, _ = network.forward_normalized(net, obs, mask)
                return p, v
            return search_pi_sample(game, oracle, states, rng, cfg,
                                    self.mcts.temperature(turn))

        return think, True


@dataclasses.dataclass(frozen=True)
class NetworkOnly(PlayerSpec):
    """Raw network policy (``Benchmark.NetworkOnly``,
    ``src/benchmark.jl:177-182`` + ``PlayerWithTemperature``)."""

    tau: float = 1.0

    def make_think(self, game, netspec):
        network = Network(game, netspec.inference_spec())

        def think(net, states, turn, rng):
            obs = jax.vmap(game.observe)(states)
            mask = jax.vmap(game.legal_mask)(states)
            p, _, _, _ = network.forward_normalized(net, obs, mask)
            return envcore.apply_temperature(p, self.tau)

        return think, True


@dataclasses.dataclass(frozen=True)
class MctsRollouts(PlayerSpec):
    """Vanilla MCTS with random rollouts (``Benchmark.MctsRollouts``,
    ``src/benchmark.jl:156-166``).

    ``max_playout_plies`` truncates the playout scan with a heuristic
    bootstrap (see :func:`search.mcts.rollout_oracle`) — needed on games
    whose full-length playout program exceeds this worker's envelope
    (mancala; NOTES.md round-4 re-bisect)."""

    mcts: cfgmod.MctsParams
    max_playout_plies: Optional[int] = None

    def make_think(self, game, netspec):
        cfg = mcts_config(self.mcts)
        oracle = mcts.rollout_oracle(game, gamma=self.mcts.gamma,
                                     max_plies=self.max_playout_plies)

        def think(net, states, turn, rng):
            return search_pi_sample(game, oracle, states, rng, cfg,
                                    self.mcts.temperature(turn))

        return think, False


@dataclasses.dataclass(frozen=True)
class MinMaxTS(PlayerSpec):
    """Minmax tree search (``Benchmark.MinMaxTS``, ``src/benchmark.jl:183-194``)."""

    depth: int
    amplify_rewards: bool = True
    tau: float = 0.0

    def make_think(self, game, netspec):
        player = MinMaxPlayer(depth=self.depth,
                              amplify_rewards=self.amplify_rewards,
                              tau=self.tau)

        def think(net, states, turn, rng):
            return player.think(game, states)

        return think, False


@dataclasses.dataclass(frozen=True)
class RandomPlayerSpec(PlayerSpec):
    """Uniform random player (``src/play.jl:59-71``)."""

    def make_think(self, game, netspec):
        def think(net, states, turn, rng):
            mask = jax.vmap(game.legal_mask)(states)
            p = mask.astype(jnp.float32)
            return p / jnp.maximum(p.sum(-1, keepdims=True), 1.0)

        return think, False


@dataclasses.dataclass(frozen=True)
class EpsilonGreedy(PlayerSpec):
    """Wrapper mixing a uniform random move with probability eps
    (``EpsilonGreedyPlayer``, ``src/play.jl:78-101``)."""

    player: PlayerSpec
    eps: float

    def make_think(self, game, netspec):
        inner, uses_net = self.player.make_think(game, netspec)

        def think(net, states, turn, rng):
            pi = inner(net, states, turn, rng)
            mask = jax.vmap(game.legal_mask)(states)
            uni = mask.astype(jnp.float32)
            uni = uni / jnp.maximum(uni.sum(-1, keepdims=True), 1.0)
            return (1.0 - self.eps) * pi + self.eps * uni

        return think, uses_net


@dataclasses.dataclass(frozen=True)
class Duel:
    """Two-player benchmark evaluation spec (``Benchmark.Duel``,
    ``src/benchmark.jl:47-62``): ``player`` (instantiated with the current
    net) vs ``baseline``."""

    player: PlayerSpec
    baseline: PlayerSpec
    sim: cfgmod.SimParams


@dataclasses.dataclass(frozen=True)
class Single:
    """One-player benchmark evaluation spec (``Benchmark.Single``,
    ``src/benchmark.jl:47-56``)."""

    player: PlayerSpec
    sim: cfgmod.SimParams


def player_name(spec: PlayerSpec) -> str:
    """Display names (``src/benchmark.jl:134-194`` ``name`` methods)."""
    return {
        Full: "AlphaZero",
        NetworkOnly: "Network Only",
        MctsRollouts: "MCTS",
        MinMaxTS: "MinMax",
        RandomPlayerSpec: "Random",
    }.get(type(spec), type(spec).__name__)


class DuelResult(NamedTuple):
    rewards: jnp.ndarray      # f32 [B] discounted reward, player-A POV
    redundancy: jnp.ndarray   # f32 [] duplicate-state fraction
    num_moves: jnp.ndarray    # i32 [B]


@functools.lru_cache(maxsize=128)
def _duel_program(game: Game, netspec_a: Optional[NetworkSpec],
                  netspec_b: Optional[NetworkSpec],
                  spec_a: PlayerSpec, spec_b: Optional[PlayerSpec],
                  num_lanes: int, alternate_colors: bool,
                  flip_probability: float, gamma: float, mesh=None,
                  segment_moves: int = 8):
    """Compile a program playing ``num_lanes`` games of spec_a vs spec_b.

    For one-player games (or ``spec_b is None``) player A makes every move.
    The two sides may use *different* network specs — the TPU answer to the
    reference's two-network inference server (``src/simulations.jl:70-99``):
    both think functions are evaluated each turn and the mover's policy is
    selected per lane, so cross-architecture duels need no extra machinery.
    With ``mesh``, lanes shard over the ``data`` axis (see selfplay.py).

    Like self-play, the move loop dispatches in ``segment_moves`` chunks
    with an all-games-done early exit: one fused ``max_game_length`` duel
    program crashes the TPU worker on long games (mancala's 120-ply duels
    faulted at every lane count while its segmented self-play ran clean —
    round 4, same fault family as NOTES.md's fused self-play program).
    The math and RNG stream are identical to the fused formulation.
    """
    think_a, _ = spec_a.make_think(game, netspec_a)
    think_b, _ = (spec_b.make_think(game, netspec_b) if spec_b is not None
                  else (None, False))
    B = num_lanes
    L = game.max_game_length
    if alternate_colors:
        a_is_white = (jnp.arange(B) % 2) == 0  # src/simulations.jl:223-230
    else:
        a_is_white = jnp.ones((B,), bool)

    def _seg(net_a, net_b, carry, turns, keys):

        def move(carry, inp):
            s, disc, total = carry
            turn, key = inp
            if mesh is not None:
                from .parallel import shard_axis
                s = shard_axis(mesh, s, 0)
            k_flip, k_sym, k_a, k_b, k_act, k_step = jax.random.split(
                key, 6)
            done = jax.vmap(game.terminated)(s)
            if flip_probability > 0 and game.random_symmetry is not None:
                do_flip = jax.random.bernoulli(
                    k_flip, flip_probability, (B,)) & ~done
                flipped = jax.vmap(game.random_symmetry)(
                    s, jax.random.split(k_sym, B))
                s = jax.tree.map(
                    lambda f, o: jnp.where(
                        do_flip.reshape((-1,) + (1,) * (f.ndim - 1)), f, o),
                    flipped, s)
            pi_a = think_a(net_a, s, turn, k_a)
            if think_b is None:
                pi = pi_a
            else:
                pi_b = think_b(net_b, s, turn, k_b)
                white_to_play = jax.vmap(game.to_play)(s) == envcore.WHITE
                a_to_move = white_to_play == a_is_white
                pi = jnp.where(a_to_move[:, None], pi_a, pi_b)
            a = jax.vmap(envcore.sample_from)(
                pi, jax.random.split(k_act, B))
            s2 = jax.vmap(game.step)(s, a, jax.random.split(k_step, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            r = jnp.where(done, 0.0, jax.vmap(game.reward)(s2))
            total = total + disc * r
            disc = jnp.where(done, disc, disc * gamma)
            keys_now = jax.vmap(game.canonical_key)(s)
            return (s2, disc, total), (keys_now, ~done)

        return jax.lax.scan(move, carry, (turns, keys))

    seg_jit = jax.jit(_seg)
    count_done_jit = jax.jit(
        lambda s: jnp.sum(jax.vmap(game.terminated)(s).astype(jnp.int32)))
    fin_jit = jax.jit(lambda keys, valid: _redundancy(
        keys.reshape(L * B, -1), valid.reshape(L * B)))

    def run(net_a, net_b, rng):
        rng, init_key = jax.random.split(rng)
        s0 = game.init_batch(B, init_key)
        keys = jax.random.split(rng, L)
        carry = (s0, jnp.ones((B,)), jnp.zeros((B,)))
        kblocks, vblocks = [], []
        for si in range(0, L, segment_moves):
            e = min(si + segment_moves, L)
            carry, (sk, va) = seg_jit(net_a, net_b, carry,
                                      jnp.arange(si, e), keys[si:e])
            kblocks.append(sk)
            vblocks.append(va)
            # host-level early exit once every lane's game has ended — the
            # skipped tail contributes only invalid rows.  The probe forces a
            # host sync per segment, so skip it while too few plies have been
            # played for a full batch of games to have plausibly all finished
            # (all-B-done before L/3 plies has never been observed for any
            # in-repo game at production lane counts).
            if e < L and e >= L // 3 and int(count_done_jit(carry[0])) == B:
                break
        state_keys = jnp.concatenate(kblocks, 0)
        valid = jnp.concatenate(vblocks, 0)
        l = state_keys.shape[0]
        if l < L:  # pad to one static finalizer shape
            state_keys = jnp.concatenate([
                state_keys,
                jnp.zeros((L - l,) + state_keys.shape[1:],
                          state_keys.dtype)], 0)
            valid = jnp.concatenate(
                [valid, jnp.zeros((L - l, B), bool)], 0)
        _, _, wr = carry
        rewards_a = jnp.where(a_is_white, wr, -wr)
        redundancy = fin_jit(state_keys, valid)
        return DuelResult(rewards=rewards_a, redundancy=redundancy,
                          num_moves=jnp.sum(valid.astype(jnp.int32), 0))

    return run


def _redundancy(keys, valid):
    """1 - |unique| / |total| over visited states
    (``src/simulations.jl:292-295``)."""
    cols = [(~valid).astype(jnp.int32)] + [keys[:, i]
                                           for i in range(keys.shape[1])]
    perm = memmod._lexsort(cols)
    pk = keys[perm]
    pv = valid[perm]
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), jnp.any(pk[1:] != pk[:-1], axis=-1)])
    unique = jnp.sum((boundary & pv).astype(jnp.float32))
    total = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return 1.0 - unique / total


def run_benchmark_item(game: Game, netspec: Optional[NetworkSpec],
                       net: NetState, item, rng, gamma: float = 1.0,
                       mesh=None):
    """Run one benchmark evaluation (``Benchmark.run``,
    ``src/benchmark.jl:78-99``).  Returns a ``Report.Evaluation``."""
    import time as _time

    from . import report as R
    t0 = _time.perf_counter()
    if isinstance(item, Single):
        res = play_duel(game, netspec, item.player, None, item.sim,
                        net, net, rng, gamma=gamma, mesh=mesh)
        legend = player_name(item.player)
    else:
        res = play_duel(game, netspec, item.player, item.baseline, item.sim,
                        net, net, rng, gamma=gamma, mesh=mesh)
        legend = f"{player_name(item.player)} vs {player_name(item.baseline)}"
    from .parallel import to_host
    rewards = to_host(res.rewards)
    return R.Evaluation(
        legend=legend, avgr=float(rewards.mean()),
        redundancy=float(to_host(res.redundancy)),
        rewards=list(map(float, rewards)), baseline_rewards=None,
        time=_time.perf_counter() - t0)


#: longest rollout playout scan validated clean on this worker: 42-ply
#: connect-four playouts at 1000 sims x 256 lanes ran segmented duels
#: without a fault (NOTES.md round-4 re-bisect), while mancala's 120-ply
#: playout scan crashed the worker at EVERY lane count tried (128, 32).
ROLLOUT_VALIDATED_PLIES = 42
#: sims x lanes ceiling validated at that playout length.
ROLLOUT_LANE_BUDGET = 256_000


def rollout_safe_sim(sim: cfgmod.SimParams, *specs,
                     game: Game) -> cfgmod.SimParams:
    """Guard for the bisected TPU-worker fault family in rollout-oracle
    duel programs (scripts/repro_duel256.py, NOTES.md rounds 2-4).

    The round-4 re-bisect identified the playout scan LENGTH inside the
    search program as the faulting variable — not the sims x lanes
    product (c4 1000x256x42 runs; mancala 1000x32x120 crashes).  Two
    checks follow:

    * playout length over :data:`ROLLOUT_VALIDATED_PLIES`: lane chunking
      demonstrably does NOT help, so the guard refuses to mutate the sim
      and instead warns — the spec should set
      ``MctsRollouts.max_playout_plies`` (heuristic-bootstrapped
      truncation) as the mancala experiment does.
    * sims x lanes over :data:`ROLLOUT_LANE_BUDGET` (the validated
      envelope at <=42 plies): chunk lanes (power of two);
      ``SimParams.num_rounds`` scales up so ``num_games`` is unchanged.
    """
    rollout = [s for s in specs if isinstance(s, MctsRollouts)]
    if not rollout:
        return sim
    rollout_sims = max(s.mcts.num_iters_per_turn for s in rollout)
    plies = max(
        min(s.max_playout_plies or game.max_game_length,
            game.max_game_length) for s in rollout)
    if plies > ROLLOUT_VALIDATED_PLIES:
        import warnings
        warnings.warn(
            f"rollout playout scan of {plies} plies exceeds the "
            f"validated {ROLLOUT_VALIDATED_PLIES}-ply envelope on this "
            f"worker and is known to fault it at any lane count; set "
            f"MctsRollouts.max_playout_plies (NOTES.md round-4 re-bisect)",
            stacklevel=2)
    if sim.num_lanes * rollout_sims > ROLLOUT_LANE_BUDGET:
        safe = max(1, ROLLOUT_LANE_BUDGET // rollout_sims)
        safe = max(1, 1 << (safe.bit_length() - 1))  # power-of-two lanes
        if safe < sim.num_lanes:
            sim = dataclasses.replace(sim, num_lanes=safe)
    return sim


def ternary_stats(rewards) -> Tuple[int, int, int]:
    """(won, draw, lost) counts (``src/benchmark.jl:105-121``)."""
    r = np.asarray(rewards)
    return int((r > 0).sum()), int((r == 0).sum()), int((r < 0).sum())


def play_duel(game: Game, netspec: Optional[NetworkSpec], spec_a: PlayerSpec,
              spec_b: Optional[PlayerSpec], sim: cfgmod.SimParams,
              net_a, net_b, rng, gamma: float = 1.0,
              netspec_b: Optional[NetworkSpec] = None,
              mesh=None) -> DuelResult:
    """Play ``sim.num_games`` games (rounded up to lane multiples), A vs B.

    ``netspec_b`` lets player B run a *different architecture* than A
    (defaults to ``netspec``): pass ``(netspec, net_a)`` for A and
    ``(netspec_b, net_b)`` for B — the capability the reference implements
    with its two-network inference server (``src/simulations.jl:70-99``).
    """
    from .utils import watchdog as WD
    if netspec_b is None:
        netspec_b = netspec
    sim = rollout_safe_sim(sim, spec_a, spec_b, game=game)
    if mesh is not None:
        from .parallel import put_replicated
        net_a = put_replicated(mesh, net_a)
        net_b = put_replicated(mesh, net_b)
    prog = _duel_program(game, netspec, netspec_b, spec_a, spec_b,
                         sim.num_lanes, sim.alternate_colors,
                         sim.flip_probability, gamma, mesh)
    steady = WD.dispatch_timeout()
    outs = []
    for r in range(sim.num_rounds):
        rng, sub = jax.random.split(rng)
        budget = steady if r else WD.first_call_timeout(steady)
        with WD.DispatchWatchdog(budget, f"duel round {r}"):
            out = prog(net_a, net_b, sub)
            jax.block_until_ready(out.rewards)
        outs.append(out)
    # concatenate on HOST: an eager device concatenate over sharded round
    # outputs becomes an ad-hoc collective (NOTES.md rendezvous deadlocks)
    # and cannot run at all on multi-process non-addressable arrays
    from .parallel import to_host
    return DuelResult(
        rewards=np.concatenate([to_host(o.rewards) for o in outs]),
        redundancy=np.mean([to_host(o.redundancy) for o in outs]),
        num_moves=np.concatenate([to_host(o.num_moves) for o in outs]),
    )
