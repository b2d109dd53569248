"""Game-interface conformance checker, callable from the CLI.

Re-design of ``/root/reference/src/scripts/test_game.jl:37-110``: generates
reachable states via batched random play and asserts the interface
invariants (mask shapes, observation dtype, symmetry consistency, legal-move
availability, terminal behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import core
from ..envs.core import Game


def check_game(game: Game, num_lanes: int = 32, seed: int = 0) -> None:
    B = num_lanes

    @jax.jit
    def rollout(key):
        s0 = game.init_batch(B, key)

        def body(s, key):
            done = jax.vmap(game.terminated)(s)
            legal = jax.vmap(game.legal_mask)(s)
            a_key, s_key = jax.random.split(key)
            a = jax.vmap(core.sample_from)(
                legal.astype(jnp.float32), jax.random.split(a_key, B))
            s2 = jax.vmap(game.step)(s, a, jax.random.split(s_key, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            return s2, (s, ~done)

        _, (traj, fresh) = jax.lax.scan(
            body, s0, jax.random.split(key, game.max_game_length))
        return traj, fresh

    traj, fresh = rollout(jax.random.key(seed))
    L = game.max_game_length
    flat = jax.tree.map(lambda x: x.reshape((L * B,) + x.shape[2:]), traj)
    valid = np.asarray(fresh).reshape(-1)
    m = valid.sum()
    assert m > 0, "no states generated"

    mask = np.asarray(jax.jit(jax.vmap(game.legal_mask))(flat))
    obs = np.asarray(jax.jit(jax.vmap(game.observe))(flat))
    done = np.asarray(jax.jit(jax.vmap(game.terminated))(flat))
    player = np.asarray(jax.jit(jax.vmap(game.to_play))(flat))
    keys = np.asarray(jax.jit(jax.vmap(game.canonical_key))(flat))
    rew = np.asarray(jax.jit(jax.vmap(game.reward))(flat))

    assert mask.shape == (L * B, game.num_actions), "bad mask shape"
    assert mask.dtype == bool, "mask must be boolean"
    assert obs.shape == (L * B,) + game.obs_shape, "bad observation shape"
    assert obs.dtype == np.float32, "observation must be float32"
    assert np.isin(player[valid], [0, 1]).all(), "bad player values"
    if not game.two_players:
        assert (player[valid] == 0).all(), "one-player game must stay white"
    assert keys.shape == (L * B, game.key_size), "bad canonical key shape"
    assert np.isfinite(rew[valid]).all(), "non-finite rewards"
    assert (mask[valid & ~done].sum(-1) > 0).all(), \
        "non-terminal state without a legal action"
    if game.heuristic_value is not None:
        heur = np.asarray(jax.jit(jax.vmap(game.heuristic_value))(flat))
        assert np.isfinite(heur[valid]).all(), "non-finite heuristic values"
    if game.symmetrize is not None and game.num_symmetries:
        pi = np.where(mask, 1.0, 0.0).astype(np.float32)
        pi /= np.maximum(pi.sum(-1, keepdims=True), 1)
        sub = jax.tree.map(lambda x: x[:64], flat)
        sym_s, sym_pi = jax.jit(jax.vmap(game.symmetrize))(
            sub, jnp.asarray(pi[:64]))
        S = game.num_symmetries
        sym_flat = jax.tree.map(
            lambda x: x.reshape((64 * S,) + x.shape[2:]), sym_s)
        sym_mask = np.asarray(
            jax.jit(jax.vmap(game.legal_mask))(sym_flat)).reshape(64, S, -1)
        sp = np.asarray(sym_pi)
        assert (sp * ~sym_mask == 0).all(), \
            "symmetry puts policy mass on illegal actions"
        np.testing.assert_allclose(
            sp.sum(-1), np.broadcast_to(pi[:64].sum(-1)[:, None], sp.shape[:2]),
            atol=1e-5, err_msg="symmetry does not preserve policy mass")
