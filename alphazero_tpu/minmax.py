"""Vectorized full-width minmax baseline.

Re-design of ``/root/reference/src/minmax.jl``: the recursive scalar tree
search becomes a depth-static batched expansion — at each level every lane's
state is tiled over all actions and stepped with one ``vmap``, so a depth-d
search evaluates ``B * A^d`` boards in pure tensor ops (no host recursion at
runtime; the recursion only builds the jax graph).  Lanes are processed in
chunks to bound memory.

Semantics preserved: reward amplification to ±inf on win detection
(``minmax.jl:14,34-36``), value 0 at terminal states (``minmax.jl:19-20``),
heuristic values at the depth horizon, sign flips on player switches, and the
scale-invariant stochastic action selection of ``MinMax.Player``
(``minmax.jl:87-114``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .envs import core as envcore
from .envs.core import Game

# numpy constant: module-level jnp.* would initialize the XLA backend
# at import time, which breaks jax.distributed.initialize (it must run
# before any backend use; see parallel/distributed.py)
INF = np.float32(np.inf)


def _tile_actions(game: Game, states):
    """[M] states -> ([M*A] states, [M*A] actions): every action from every
    state, grouped state-major."""
    A = game.num_actions
    rep = lambda x: jnp.repeat(x, A, axis=0)
    tiled = jax.tree.map(rep, states)
    m = jax.tree.leaves(states)[0].shape[0]
    actions = jnp.tile(jnp.arange(A, dtype=jnp.int32), m)
    return tiled, actions


def _value(game: Game, states, depth: int, amplify: bool, gamma: float):
    """Value of ``states`` [M] for the player to move (``minmax.jl:17-26``)."""
    terminated = jax.vmap(game.terminated)(states)
    if depth == 0:
        heur = jax.vmap(game.heuristic_value)(states)
        return jnp.where(terminated, 0.0, heur)
    qs = _qvalues(game, states, depth, amplify, gamma)  # [M, A]
    legal = jax.vmap(game.legal_mask)(states)
    best = jnp.max(jnp.where(legal, qs, -INF), axis=-1)
    return jnp.where(terminated, 0.0, best)


def _qvalues(game: Game, states, depth: int, amplify: bool, gamma: float):
    """Q-values of every action at ``states`` [M] (``minmax.jl:28-42``)."""
    tiled, actions = _tile_actions(game, states)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(actions.shape[0]))
    children = jax.vmap(game.step)(tiled, actions, keys)
    r_white = jax.vmap(game.reward)(children)
    parent_white = jnp.repeat(
        jax.vmap(game.to_play)(states) == envcore.WHITE, game.num_actions)
    r = jnp.where(parent_white, r_white, -r_white)
    if amplify:
        r = jnp.where(r == 0.0, 0.0, INF * jnp.sign(r))
    child_v = _value(game, children, depth - 1, amplify, gamma)
    pswitch = (jnp.repeat(jax.vmap(game.to_play)(states), game.num_actions)
               != jax.vmap(game.to_play)(children))
    q = r + gamma * jnp.where(pswitch, -child_v, child_v)
    return q.reshape(-1, game.num_actions)


def _policy_from_q(qs, legal, tau: float):
    """Action distribution from Q-values (``minmax.jl:87-114``)."""
    neg = jnp.where(legal, qs, -INF)
    winning = legal & (qs == INF)
    any_win = jnp.any(winning, -1, keepdims=True)
    notlosing = legal & (qs > -INF)
    any_nl = jnp.any(notlosing, -1, keepdims=True)
    uniform_l = legal.astype(jnp.float32)
    uniform_w = winning.astype(jnp.float32)
    qmax = jnp.max(neg, -1, keepdims=True)
    if tau == 0.0:
        best = legal & (qs == qmax)
        pi_soft = best.astype(jnp.float32)
    else:
        finite_q = jnp.where(notlosing, jnp.abs(qs), 0.0)
        C = jnp.max(finite_q, -1, keepdims=True) + 1e-7
        logits = jnp.where(notlosing, (qs - qmax) / C / tau, -INF)
        pi_soft = jnp.exp(logits)
    pi = jnp.where(any_win, uniform_w,
                   jnp.where(any_nl, pi_soft, uniform_l))
    return pi / jnp.maximum(jnp.sum(pi, -1, keepdims=True), 1e-30)


@dataclasses.dataclass(frozen=True)
class MinMaxPlayer:
    """Stochastic minmax player spec (``MinMax.Player``, ``minmax.jl:77-85``)."""

    depth: int
    amplify_rewards: bool
    tau: float = 0.0
    gamma: float = 1.0
    chunk_size: Optional[int] = None  # lanes per expansion chunk

    def think(self, game: Game, states):
        """Batched policy over [B] states; jit-compatible."""
        B = jax.tree.leaves(states)[0].shape[0]
        ideal = max(1, min(B, (1 << 18)
                           // max(game.num_actions ** self.depth, 1)))
        cs = self.chunk_size
        if cs is None:  # largest divisor of B not exceeding the ideal
            cs = max(d for d in range(1, ideal + 1) if B % d == 0)
        chunks = jax.tree.map(
            lambda x: x.reshape((B // cs, cs) + x.shape[1:]), states)

        def one_chunk(s):
            qs = _qvalues(game, s, self.depth, self.amplify_rewards,
                          self.gamma)
            legal = jax.vmap(game.legal_mask)(s)
            return _policy_from_q(qs, legal, self.tau)

        pis = jax.lax.map(one_chunk, chunks)
        return pis.reshape(B, game.num_actions)
