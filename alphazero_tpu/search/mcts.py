"""Fully batched, on-device Monte-Carlo Tree Search.

TPU-native re-design of the reference's sequential, hashtable-based MCTS
(``/root/reference/src/mcts.jl``).  Instead of one ``Dict{State,StateInfo}``
per worker task with an async inference server (``src/batchifier.jl``), the
tree is a fixed-shape array structure over a whole *batch* of games: node
arrays of shape ``[B, num_sims+1, A]`` traversed with ``lax.while_loop`` and
updated with scatters, so that every simulation step evaluates the network on
all ``B`` leaf states in a single tensor op.  The async batching layer of the
reference disappears entirely.

Search semantics preserved exactly (validated in tests/test_mcts.py against a
pure-python transliteration of the documented algorithm):

* PUCT scores ``Q + cpuct * P * sqrt(Ntot) / (N+1)`` with ``Q = W / max(N,1)``
  (``src/mcts.jl:180-188``) — no AlphaGo-style init-Q.
* Root Dirichlet noise ``(1-eps) P + eps eta`` mixed *into the scores only*,
  with ``eta`` drawn once per call over legal actions
  (``src/mcts.jl:109-123,228-232``).
* Prior temperature applied to the oracle policy at node creation
  (``src/mcts.jl:157-161``).
* Backpropagation with intermediate rewards, discounting, and sign flips on
  player switches (``src/mcts.jl:199-226``); terminal states return value 0
  (``src/mcts.jl:200-201``) and absorb descents.
* Visit-count policy at the root (``src/mcts.jl:255-271``).

Design divergence (documented per SURVEY §7): the reference tree is a
transposition table keyed by state, shared across the moves of a game; here
each move gets a fresh per-move tree without transpositions.  This is the
standard array-MCTS trade-off (a few extra simulations re-derive the reused
subtree) and is validated on learning curves rather than node-for-node parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..envs import core as envcore
from ..envs.core import Game

UNVISITED = jnp.int32(-1)
NEG_INF = jnp.float32(-1e30)

# An oracle evaluates a batch of states: (states, obs[B,...], mask[B,A]) ->
# (P[B,A] normalized over legal actions, V[B] from the current player's POV).
# This is the batched analogue of `oracle(state) -> (P, V)`
# (``src/mcts.jl:6-17``).
Oracle = Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search knobs, mirroring ``MctsParams`` (``src/params.jl:49-57``) minus
    the per-turn temperature (applied by the player, not the search)."""

    num_sims: int
    gamma: float = 1.0
    cpuct: float = 1.0
    dirichlet_eps: float = 0.0
    dirichlet_alpha: float = 1.0
    prior_temperature: float = 1.0


class Tree(NamedTuple):
    """Array-of-structs search tree over a batch of B games.

    ``N = num_sims + 1`` node slots per game; node 0 is the root; node ``i``
    is the node expanded by simulation ``i`` (a slot stays dead when the
    simulation ended on a terminal node instead of expanding).
    """

    states: Any            # pytree, leaves [B, N, ...]
    player: jnp.ndarray    # i32  [B, N] player to move
    terminal: jnp.ndarray  # bool [B, N]
    reward: jnp.ndarray    # f32  [B, N] white reward of transition into node
    value: jnp.ndarray     # f32  [B, N] oracle value (current-player POV)
    prior: jnp.ndarray     # f32  [B, N, A]
    legal: jnp.ndarray     # bool [B, N, A]
    visits: jnp.ndarray    # i32  [B, N, A]
    qsum: jnp.ndarray      # f32  [B, N, A]  (the reference's W)
    children: jnp.ndarray  # i32  [B, N, A], UNVISITED if unexpanded


class SearchResults(NamedTuple):
    policy: jnp.ndarray        # f32 [B, A] visit-count distribution
    root_visits: jnp.ndarray   # i32 [B, A]
    root_q: jnp.ndarray        # f32 [B, A] mean action values at root
    root_value: jnp.ndarray    # f32 [B] oracle value of root
    nodes_traversed: jnp.ndarray  # i32 [] total edges walked (for depth stats)
    tree: Tree


def _batch_gather(x, idx):
    """x: [B, N, ...], idx: [B] -> [B, ...]."""
    return jax.vmap(lambda row, i: row[i])(x, idx)


def _tree_gather_state(states, idx):
    return jax.tree.map(lambda x: _batch_gather(x, idx), states)


def _apply_prior_temperature(p, legal, tau):
    """``Util.apply_temperature`` on the legal slice (``src/mcts.jl:157-161``)."""
    if tau == 1.0:
        return p
    powed = jnp.where(p > 0, p, 1.0) ** (1.0 / max(tau, 1e-6))
    powed = jnp.where(legal & (p > 0), powed, 0.0)
    return powed / jnp.maximum(jnp.sum(powed, -1, keepdims=True), 1e-30)


def dirichlet_noise(key, legal, alpha):
    """Dirichlet(alpha) over legal actions (``src/mcts.jl:228-232``)."""
    g = jax.random.gamma(key, alpha, legal.shape).astype(jnp.float32)
    g = jnp.where(legal, g, 0.0)
    return g / jnp.maximum(jnp.sum(g, -1, keepdims=True), 1e-30)


def init_tree(game: Game, cfg: MCTSConfig, roots, root_p, root_v) -> Tree:
    """Allocate the node arrays and install the evaluated roots."""
    B = root_p.shape[0]
    N = cfg.num_sims + 1
    A = game.num_actions

    def alloc(x):
        return jnp.zeros((B, N) + x.shape[1:], x.dtype).at[:, 0].set(x)

    root_legal = jax.vmap(game.legal_mask)(roots)
    prior = _apply_prior_temperature(root_p, root_legal, cfg.prior_temperature)
    return Tree(
        states=jax.tree.map(alloc, roots),
        player=alloc(jax.vmap(game.to_play)(roots).astype(jnp.int32)),
        terminal=alloc(jax.vmap(game.terminated)(roots)),
        reward=jnp.zeros((B, N), jnp.float32),
        value=alloc(root_v.astype(jnp.float32)),
        prior=alloc(prior),
        legal=alloc(root_legal),
        visits=jnp.zeros((B, N, A), jnp.int32),
        qsum=jnp.zeros((B, N, A), jnp.float32),
        children=jnp.full((B, N, A), UNVISITED),
    )


def _puct_scores(tree: Tree, node, eta, eps, cpuct):
    """UCT scores at ``node`` [B] (``src/mcts.jl:180-188``), -inf on illegal."""
    n = _batch_gather(tree.visits, node).astype(jnp.float32)    # [B, A]
    w = _batch_gather(tree.qsum, node)
    p = _batch_gather(tree.prior, node)
    legal = _batch_gather(tree.legal, node)
    is_root = (node == 0)[:, None]
    p = jnp.where(is_root & (eps > 0), (1.0 - eps) * p + eps * eta, p)
    q = w / jnp.maximum(n, 1.0)
    sqrt_ntot = jnp.sqrt(jnp.sum(n, -1, keepdims=True))
    u = cpuct * p * sqrt_ntot / (n + 1.0)
    return jnp.where(legal, q + u, NEG_INF)


class _SelectState(NamedTuple):
    cur: jnp.ndarray           # i32 [B] current node during descent
    done: jnp.ndarray          # bool [B] descent finished
    expand_parent: jnp.ndarray  # i32 [B] parent of expansion edge (-1: none)
    expand_action: jnp.ndarray  # i32 [B]
    depth: jnp.ndarray         # i32 [B] edges recorded so far
    path_nodes: jnp.ndarray    # i32 [B, D]
    path_actions: jnp.ndarray  # i32 [B, D]
    d: jnp.ndarray             # i32 [] loop counter


def _select(tree: Tree, eta, cfg: MCTSConfig, max_depth: int) -> _SelectState:
    """Walk every lane down its tree until an unexpanded edge or a terminal
    node is hit (the in-tree phase of ``run_simulation!``,
    ``src/mcts.jl:199-226``)."""
    B = tree.player.shape[0]
    init = _SelectState(
        cur=jnp.zeros((B,), jnp.int32),
        done=_batch_gather(tree.terminal, jnp.zeros((B,), jnp.int32)),
        expand_parent=jnp.full((B,), -1, jnp.int32),
        expand_action=jnp.zeros((B,), jnp.int32),
        depth=jnp.zeros((B,), jnp.int32),
        path_nodes=jnp.zeros((B, max_depth), jnp.int32),
        path_actions=jnp.zeros((B, max_depth), jnp.int32),
        d=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return jnp.any(~s.done) & (s.d < max_depth)

    def body(s):
        scores = _puct_scores(tree, s.cur, eta, cfg.dirichlet_eps, cfg.cpuct)
        action = jnp.argmax(scores, -1).astype(jnp.int32)
        child = jax.vmap(lambda c, n, a: c[n, a])(tree.children, s.cur, action)
        active = ~s.done
        # record the traversed edge (including the expansion edge)
        brange = jnp.arange(B)
        slot = jnp.where(active, s.depth, max_depth)  # OOB drop when inactive
        path_nodes = s.path_nodes.at[brange, slot].set(s.cur, mode="drop")
        path_actions = s.path_actions.at[brange, slot].set(action, mode="drop")
        depth = s.depth + active.astype(jnp.int32)
        needs_expand = active & (child == UNVISITED)
        expand_parent = jnp.where(needs_expand, s.cur, s.expand_parent)
        expand_action = jnp.where(needs_expand, action, s.expand_action)
        child_terminal = _batch_gather(tree.terminal, jnp.maximum(child, 0))
        done = s.done | needs_expand | (active & child_terminal)
        cur = jnp.where(active & ~needs_expand, child, s.cur)
        return _SelectState(cur, done, expand_parent, expand_action, depth,
                            path_nodes, path_actions, s.d + 1)

    return jax.lax.while_loop(cond, body, init)


def _backprop(tree: Tree, sel: _SelectState, leaf_node, leaf_value,
              cfg: MCTSConfig, max_depth: int) -> Tree:
    """Propagate the leaf value up the recorded path, with discounting and
    sign flips on player switches (``src/mcts.jl:214-221``)."""
    B = tree.player.shape[0]
    brange = jnp.arange(B)

    def body(k, carry):
        qsum, visits, q, child = carry
        d = sel.depth - 1 - k              # [B] current edge (from the bottom)
        active = d >= 0
        dd = jnp.maximum(d, 0)
        parent = sel.path_nodes[brange, dd]
        action = sel.path_actions[brange, dd]
        r_white = _batch_gather(tree.reward, child)
        parent_player = _batch_gather(tree.player, parent)
        child_player = _batch_gather(tree.player, child)
        r = jnp.where(parent_player == envcore.WHITE, r_white, -r_white)
        qnext = jnp.where(parent_player == child_player, q, -q)
        q_edge = r + cfg.gamma * qnext
        pa = jnp.where(active, parent, tree.player.shape[1])  # OOB drop
        qsum = qsum.at[brange, pa, action].add(q_edge, mode="drop")
        visits = visits.at[brange, pa, action].add(1, mode="drop")
        q = jnp.where(active, q_edge, q)
        child = jnp.where(active, parent, child)
        return qsum, visits, q, child

    qsum, visits, _, _ = jax.lax.fori_loop(
        0, max_depth, body,
        (tree.qsum, tree.visits, leaf_value, leaf_node))
    return tree._replace(qsum=qsum, visits=visits)


def search(game: Game, oracle: Oracle, roots, rng, cfg: MCTSConfig,
           max_depth: Optional[int] = None) -> SearchResults:
    """Run ``cfg.num_sims`` batched MCTS simulations from ``roots`` [B, ...].

    The batched analogue of ``MCTS.explore!`` + ``MCTS.policy``
    (``src/mcts.jl:239-271``).  Jit-compatible; call under ``jax.jit`` (or
    inside a jitted self-play loop).
    """
    if max_depth is None:
        max_depth = game.max_game_length + 1
    B = jax.tree.leaves(roots)[0].shape[0]
    noise_key, rng = jax.random.split(rng)

    root_obs = jax.vmap(game.observe)(roots)
    root_mask = jax.vmap(game.legal_mask)(roots)
    root_p, root_v = oracle(roots, root_obs, root_mask)
    tree = init_tree(game, cfg, roots, root_p, root_v)
    eta = dirichlet_noise(noise_key, root_mask, cfg.dirichlet_alpha)

    step_keys = jax.random.split(rng, cfg.num_sims)

    def sim_body(i, carry):
        tree, traversed = carry
        sel = _select(tree, eta, cfg, max_depth)
        expanding = sel.expand_parent >= 0
        # --- expand: step the env over the expansion edge ------------------
        parent_idx = jnp.maximum(sel.expand_parent, 0)
        parent_states = _tree_gather_state(tree.states, parent_idx)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            step_keys[i - 1], jnp.arange(B))
        child_states = jax.vmap(game.step)(
            parent_states, sel.expand_action, keys)
        child_obs = jax.vmap(game.observe)(child_states)
        child_mask = jax.vmap(game.legal_mask)(child_states)
        child_p, child_v = oracle(child_states, child_obs, child_mask)
        child_terminal = jax.vmap(game.terminated)(child_states)
        child_prior = _apply_prior_temperature(
            child_p, child_mask, cfg.prior_temperature)
        # new node slot: this simulation's index
        brange = jnp.arange(B)
        slot = jnp.where(expanding, i, tree.player.shape[1])  # OOB drop

        def put(arr, val):
            return arr.at[brange, slot].set(val, mode="drop")

        tree = tree._replace(
            states=jax.tree.map(put, tree.states, child_states),
            player=put(tree.player,
                       jax.vmap(game.to_play)(child_states).astype(jnp.int32)),
            terminal=put(tree.terminal, child_terminal),
            reward=put(tree.reward, jax.vmap(game.reward)(child_states)),
            value=put(tree.value, child_v.astype(jnp.float32)),
            prior=put(tree.prior, child_prior),
            legal=put(tree.legal, child_mask),
            children=tree.children.at[
                brange,
                jnp.where(expanding, parent_idx, tree.player.shape[1]),
                sel.expand_action].set(i, mode="drop"),
        )
        # --- leaf value ----------------------------------------------------
        # expansion: oracle value (0 if the new node is terminal,
        # ``src/mcts.jl:200-201,205-207``); terminal descent: 0.
        leaf_node = jnp.where(expanding, i, sel.cur).astype(jnp.int32)
        leaf_value = jnp.where(expanding & ~child_terminal, child_v, 0.0)
        tree = _backprop(tree, sel, leaf_node, leaf_value.astype(jnp.float32),
                         cfg, max_depth)
        return tree, traversed + jnp.sum(sel.depth)

    tree, traversed = jax.lax.fori_loop(
        1, cfg.num_sims + 1, sim_body, (tree, jnp.zeros((), jnp.int32)))

    root_visits = tree.visits[:, 0]
    ntot = jnp.sum(root_visits, -1, keepdims=True).astype(jnp.float32)
    policy = root_visits.astype(jnp.float32) / jnp.maximum(ntot, 1.0)
    root_q = tree.qsum[:, 0] / jnp.maximum(
        root_visits.astype(jnp.float32), 1.0)
    return SearchResults(
        policy=policy,
        root_visits=root_visits,
        root_q=root_q,
        root_value=tree.value[:, 0],
        nodes_traversed=traversed,
        tree=tree,
    )


# ---------------------------------------------------------------------------
# Stock oracles (``src/mcts.jl:28-72``)
# ---------------------------------------------------------------------------


def random_oracle(game: Game) -> Oracle:
    """Uniform prior, zero value (``MCTS.RandomOracle``, ``src/mcts.jl:62-72``)."""

    def fn(states, obs, mask):
        del states, obs
        p = mask.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
        return p, jnp.zeros(p.shape[:1], jnp.float32)

    return fn


def rollout_oracle(game: Game, gamma: float = 1.0,
                   rng_seed: int = 0) -> Oracle:
    """Uniform prior; value from one random playout — the "vanilla MCTS"
    oracle (``MCTS.RolloutOracle``, ``src/mcts.jl:28-60``).

    The playout is a ``scan`` of masked random steps over the maximum game
    length, with rewards discounted from the evaluated state onward.
    """

    def fn(states, obs, mask):
        del obs
        B = mask.shape[0]
        p = mask.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
        # derive per-call randomness from the state contents so the oracle
        # stays a pure function (fresh randomness per distinct query)
        keys0 = jax.vmap(
            lambda s: jax.random.fold_in(
                jax.random.key(rng_seed),
                jnp.sum(jnp.abs(jnp.concatenate(
                    [x.reshape(-1).astype(jnp.int32)
                     for x in jax.tree.leaves(s)])))))(states)

        def body(carry, _):
            s, disc, acc, keys = carry
            done = jax.vmap(game.terminated)(s)
            legal = jax.vmap(game.legal_mask)(s)
            keys, akeys, skeys = jax.vmap(
                lambda k: tuple(jax.random.split(k, 3)))(keys)
            a = jax.vmap(envcore.sample_from)(
                legal.astype(jnp.float32), akeys)
            s2 = jax.vmap(game.step)(s, a, skeys)
            r = jax.vmap(game.reward)(s2)
            acc = acc + jnp.where(done, 0.0, disc * r)
            disc = jnp.where(done, disc, disc * gamma)
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            return (s2, disc, acc, keys), None

        init = (states, jnp.ones((B,), jnp.float32),
                jnp.zeros((B,), jnp.float32), keys0)
        (_, _, wr, _), _ = jax.lax.scan(
            body, init, None, length=game.max_game_length)
        white = jax.vmap(game.to_play)(states) == envcore.WHITE
        return p, jnp.where(white, wr, -wr)

    return fn
