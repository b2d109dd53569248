"""Jitted batched self-play.

Re-design of the reference's episode machinery (``src/play.jl:298-315``,
``src/simulations.jl:207-244``): instead of ``num_workers`` async tasks each
playing one scalar game against an inference server, a single jitted program
steps ``num_lanes`` games in lockstep — a ``scan`` over the (padded) game
length whose body runs one full batched MCTS per move.  Finished lanes are
frozen with masked no-ops.

The trace → training-sample conversion (discounted returns with per-player
sign flips, remaining-move counts; ``src/memory.jl:74-87``) happens inside
the same jitted program with a reverse scan.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .envs import core as envcore
from .envs.core import Game
from .search import gumbel, mcts
from .utils.schedules import Schedule


class TraceBatch(NamedTuple):
    """Flattened self-play samples ready for ``memory.push``."""

    states: Any           # pytree [M, ...] state before each recorded move
    pi: jnp.ndarray       # f32 [M, A] MCTS visit policy (zeros on illegal)
    z: jnp.ndarray        # f32 [M] discounted return, current-player POV
    t: jnp.ndarray        # f32 [M] remaining moves until game end
    key: jnp.ndarray      # i32 [M, K]
    valid: jnp.ndarray    # bool [M]
    white_reward: jnp.ndarray   # f32 [B] total white reward per game
    num_moves: jnp.ndarray      # i32 [B] game lengths
    nodes_traversed: jnp.ndarray  # i32 [] MCTS depth statistic
    num_sims: jnp.ndarray         # i32 [] total simulations run


def _make_move_fn(game: Game, oracle: mcts.Oracle, cfg, temperature,
                  num_lanes: int, flip_probability: float, mesh=None):
    """The per-move scan body shared by the fused and segmented drivers.

    ``mesh`` (optional) shards the lane axis over the mesh's ``data`` axis:
    the state batch is constrained at every move entry so GSPMD partitions
    the whole per-move MCTS (tree slabs are node-major ``[N, B, ...]``;
    their lane axis inherits the sharding by propagation).  Lanes never
    interact, so the program is embarrassingly data-parallel and XLA only
    inserts collectives for the scalar depth/sim statistics.
    """
    B = num_lanes
    use_gumbel = isinstance(cfg, gumbel.GumbelConfig)
    reuse = (not use_gumbel) and getattr(cfg, "reuse_tree", False)

    def move(carry, inp):
        s, ctree, cvalid, traversed, sims = carry
        turn, key = inp
        if mesh is not None:
            from .parallel import shard_axis
            s = shard_axis(mesh, s, 0)
            ctree = shard_axis(mesh, ctree, 1)
        k_flip, k_sym, k_search, k_act, k_step = jax.random.split(key, 5)
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
        if use_gumbel:
            # Gumbel self-play: play the halving argmax (per-move Gumbel
            # noise is the exploration); train on the completed policy.
            res = gumbel.search(game, oracle, s, k_search, cfg)
            a = res.action
        else:
            carried = None
            if reuse:
                # a carried subtree is only usable when its stored root
                # state matches the actual search root (this invalidates
                # flipped lanes and stochastic-transition mismatches in
                # one stroke)
                stored_key = jax.vmap(game.canonical_key)(
                    jax.tree.map(lambda x: x[0], ctree.states))
                cur_key = jax.vmap(game.canonical_key)(s)
                cvalid = cvalid & jnp.all(stored_key == cur_key, axis=-1)
                carried = (ctree, cvalid)
            res = mcts.search(game, oracle, s, k_search, cfg,
                              carried=carried)
            tau = temperature(turn)
            pi_sample = envcore.apply_temperature(res.policy, tau)
            a = jax.vmap(envcore.sample_from)(
                pi_sample, jax.random.split(k_act, B))
        if reuse:
            ctree, cvalid = mcts.advance_root(game, res.tree, a,
                                              cfg.reuse_cap)
            cvalid = cvalid & ~done
        s2 = jax.vmap(game.step)(s, a, jax.random.split(k_step, B))
        s2 = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
            s2, s)
        r = jnp.where(done, 0.0, jax.vmap(game.reward)(s2))
        out = dict(
            states=s,
            pi=res.policy,
            player=jax.vmap(game.to_play)(s),
            r=r,
            valid=~done,
        )
        traversed = traversed + res.nodes_traversed
        sims = sims + jnp.sum((~done).astype(jnp.int32)) * cfg.num_sims
        return (s2, ctree, cvalid, traversed, sims), out

    return move, reuse


def _init_carry(game: Game, cfg, num_lanes: int, reuse: bool, init_key):
    s0 = game.init_batch(num_lanes, init_key)
    ctree0, cvalid0 = mcts.empty_carry(
        game, cfg.reuse_cap if reuse else 1, num_lanes)
    return (s0, ctree0, cvalid0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def _finalize_traces(game: Game, gamma: float, num_lanes: int, carry, tr
                     ) -> TraceBatch:
    """Trace -> training samples: discounted returns walked backwards with
    per-player sign flips and remaining-move counts (``src/memory.jl:74-87``).

    Samples flatten LANE-major (``[L, B] -> [B*L]``, one game's trace
    contiguous — the order the reference pushes traces in): the lane axis
    stays the major axis of every flat array, so under a mesh the samples
    remain sharded over ``data`` instead of being all-gathered on output.
    """
    B = num_lanes
    L = tr["r"].shape[0]
    _, _, _, traversed, sims = carry

    def disc(wr_next, r_t):
        wr = r_t + gamma * wr_next
        return wr, wr

    _, wr = jax.lax.scan(disc, jnp.zeros((B,)), tr["r"], reverse=True)
    z = jnp.where(tr["player"] == envcore.WHITE, wr, -wr)
    num_moves = jnp.sum(tr["valid"].astype(jnp.int32), axis=0)  # [B]
    t_remaining = (num_moves[None, :].astype(jnp.float32)
                   - jnp.arange(L)[:, None].astype(jnp.float32))

    def flat(x):  # [L, B, ...] -> [B*L, ...], lane-major
        return jnp.moveaxis(x, 0, 1).reshape((B * L,) + x.shape[2:])

    flat_states = jax.tree.map(flat, tr["states"])
    keys_flat = jax.vmap(game.canonical_key)(flat_states)
    total_white = jnp.sum(tr["r"], axis=0)
    return TraceBatch(
        states=flat_states,
        pi=flat(tr["pi"]),
        z=flat(z),
        t=flat(t_remaining),
        key=keys_flat,
        valid=flat(tr["valid"]),
        white_reward=total_white,
        num_moves=num_moves,
        nodes_traversed=traversed,
        num_sims=sims,
    )


def self_play_batch(game: Game, oracle: mcts.Oracle, cfg: mcts.MCTSConfig,
                    temperature: Schedule, num_lanes: int, rng,
                    flip_probability: float = 0.0,
                    num_moves_cap: int = 0, mesh=None) -> TraceBatch:
    """Play ``num_lanes`` full self-play games and emit training samples.

    ``temperature`` is the per-turn action-selection schedule
    (``src/params.jl:92-101``); ``flip_probability`` applies a random board
    symmetry before each move (``src/play.jl:305-307``).

    The whole episode batch is ONE jittable program (a ``scan`` over the
    padded game length) — use :func:`make_segmented_self_play` when this is
    itself the dispatch unit on real hardware (long single dispatches can
    exceed the TPU worker's tolerance; see NOTES.md).
    """
    L = num_moves_cap or game.max_game_length
    B = num_lanes
    move, reuse = _make_move_fn(game, oracle, cfg, temperature, B,
                                flip_probability, mesh=mesh)
    rng, init_key = jax.random.split(rng)
    carry0 = _init_carry(game, cfg, B, reuse, init_key)
    keys = jax.random.split(rng, L)
    carry, tr = jax.lax.scan(move, carry0, (jnp.arange(L), keys))
    return _finalize_traces(game, cfg.gamma, B, carry, tr)


def make_segmented_self_play(game: Game, network_fwd, cfg,
                             temperature: Schedule, num_lanes: int,
                             flip_probability: float = 0.0,
                             segment_moves: int = 8,
                             num_moves_cap: int = 0, mesh=None):
    """Self-play split into short per-segment dispatches.

    Functionally identical to jitting :func:`self_play_batch`, but each
    device dispatch covers only ``segment_moves`` moves: single dispatches
    beyond ~1 minute reproducibly crash the axon TPU worker (NOTES.md), so
    the episode scan runs as a host loop over jitted segments with the
    (device-resident) carry threaded through and per-segment traces
    concatenated on device.

    ``network_fwd(net, states, obs, mask) -> (P, V)`` binds the network
    explicitly so the segment program caches across net updates.  Returns
    ``run(net, rng) -> TraceBatch``.

    With ``mesh``, lanes shard over the mesh's ``data`` axis: the initial
    carry is committed data-sharded, the net replicated, and the per-move
    state batch re-constrained inside the scan (see ``_make_move_fn``).
    This is the production multi-chip self-play path — under a multi-host
    runtime (``parallel.distributed``) every host runs the same segments on
    its chips' lane shards.
    """
    B = num_lanes
    L = num_moves_cap or game.max_game_length

    def seg(net, carry, turns, keys):
        def oracle(states, obs, mask):
            return network_fwd(net, states, obs, mask)
        move, _ = _make_move_fn(game, oracle, cfg, temperature, B,
                                flip_probability, mesh=mesh)
        return jax.lax.scan(move, carry, (turns, keys))

    seg_jit = jax.jit(seg)
    fin_jit = jax.jit(
        lambda carry, tr: _finalize_traces(game, cfg.gamma, B, carry, tr))
    reuse = (not isinstance(cfg, gumbel.GumbelConfig)
             and getattr(cfg, "reuse_tree", False))

    _done_stats = lambda states: (jax.vmap(game.terminated)(states),
                                  jax.vmap(game.reward)(states))
    if mesh is not None:
        # per-lane outputs must be readable on EVERY controller process:
        # force replication (XLA inserts the all-gather) — the natural
        # input sharding would span non-addressable devices and np.asarray
        # on it throws under the multi-controller runtime
        from jax.sharding import NamedSharding, PartitionSpec
        _rep = NamedSharding(mesh, PartitionSpec())
        done_stats_jit = jax.jit(_done_stats, out_shardings=(_rep, _rep))
    else:
        done_stats_jit = jax.jit(_done_stats)

    from .utils import watchdog as WD
    steady = WD.dispatch_timeout()
    warmed = set()

    def run(net, rng, on_progress=None) -> TraceBatch:
        """``on_progress(newly_finished_games, rewards)`` fires after every
        segment dispatch with the white-POV final-transition rewards of the
        games that just ended — the per-game measurement relay of the
        reference's ``Handlers.game_played`` path
        (``src/simulations.jl:258-266``), quantized to segment boundaries
        by the lockstep design."""
        done_prev = np.zeros((B,), bool)
        rng, init_key = jax.random.split(rng)
        carry = _init_carry(game, cfg, B, reuse, init_key)
        if mesh is not None:
            from .parallel import put_data_sharded, put_replicated
            net = put_replicated(mesh, net)
            s0, ctree0, cvalid0, trav0, sims0 = carry
            carry = (put_data_sharded(mesh, s0, 0),
                     put_data_sharded(mesh, ctree0, 1),
                     put_data_sharded(mesh, cvalid0, 0),
                     put_replicated(mesh, trav0),
                     put_replicated(mesh, sims0))
        keys = jax.random.split(rng, L)
        trs = []
        for s in range(0, L, segment_moves):
            e = min(s + segment_moves, L)
            # a hung TPU worker leaves the dispatch blocked forever; abort
            # for supervised restart + resume (utils/watchdog.py)
            budget = (steady if (e - s) in warmed
                      else WD.first_call_timeout(steady))
            with WD.DispatchWatchdog(budget, f"self-play segment {s}:{e}"):
                carry, tr = seg_jit(net, carry, jnp.arange(s, e), keys[s:e])
                trs.append(tr)
                # host-level early exit the fused scan couldn't do: stop
                # searching once every lane's game has ended
                done, rew = done_stats_jit(carry[0])
                done = np.asarray(done)
                ndone = int(done.sum())
            warmed.add(e - s)
            new = done & ~done_prev
            if on_progress is not None and new.any():
                on_progress(int(new.sum()), np.asarray(rew)[new])
                done_prev = done
            if e < L and ndone == B:
                break
        tr = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *trs)
        with WD.DispatchWatchdog(WD.first_call_timeout(steady),
                                 "self-play trace finalize"):
            out = fin_jit(carry, tr)
            jax.block_until_ready(out.num_moves)
        return out

    return run


def tree_memory_footprint(game: Game, cfg: mcts.MCTSConfig,
                          num_lanes: int) -> int:
    """Bytes of the search-tree arrays — the analogue of
    ``MCTS.approximate_memory_footprint`` (``src/mcts.jl:299-321``)."""
    N = cfg.num_sims + 1
    A = game.num_actions
    B = num_lanes
    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(game.init()))
    per_lane = (N * state_bytes          # states
                + N * (4 + 1 + 4 + 4)    # player/terminal/reward/value
                + N * A * (4 + 1 + 4 + 4 + 4))  # prior/legal/visits/qsum/kids
    return B * per_lane
