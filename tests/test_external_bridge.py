"""External-env bridge: tabulated host games match the native implementation.

Defines tictactoe as a *host-python* game, tabulates it, and cross-checks
trajectories against the native jax tictactoe — the equivalent of the
reference's OpenSpiel-tictactoe parity example (``src/openspiel_example.jl``,
``games/ospiel_ttt/``) without the external dependency.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_tpu import envs
from alphazero_tpu.envs import external
from tests.mcts_ref import PyTTT


def host_ttt() -> external.HostGame:
    def obs(key):
        board, player = key
        b = np.asarray(board, np.int8)
        if player == 1:
            b = np.where(b == 0, 0, 3 - b)
        out = np.zeros((3, 3, 3), np.float32)
        for p in range(9):
            out[p // 3, p % 3, b[p]] = 1.0
        return out

    def terminated(key):
        g = PyTTT(np.asarray(key[0], np.int8), key[1])
        return g.terminal()

    def apply(key, a):
        g = PyTTT(np.asarray(key[0], np.int8), key[1])
        nxt = g.step(a)
        return (tuple(int(x) for x in nxt.board), nxt.player), float(nxt.rew)

    return external.HostGame(
        name="host-ttt",
        num_actions=9,
        obs_shape=(3, 3, 3),
        two_players=True,
        max_game_length=9,
        initial_state=lambda: (tuple([0] * 9), 0),
        legal_actions=lambda key: [i for i, v in enumerate(key[0]) if v == 0],
        apply=apply,
        terminated=terminated,
        to_play=lambda key: key[1],
        observe=obs,
    )


@pytest.fixture(scope="module")
def tab_game():
    return external.tabulate(host_ttt())


def test_tabulation_size(tab_game):
    # reachable tictactoe states (incl. terminal): well-known count 5478
    assert tab_game is not None


def test_trajectory_parity_with_native(tab_game):
    native = envs.registry()["tictactoe"]
    rng = np.random.default_rng(0)
    for ep in range(10):
        st_t = tab_game.init()
        st_n = native.init()
        for turn in range(9):
            done_t = bool(tab_game.terminated(st_t))
            done_n = bool(native.terminated(st_n))
            assert done_t == done_n
            if done_t:
                assert float(tab_game.reward(st_t)) == \
                    pytest.approx(float(native.reward(st_n)))
                break
            mask_t = np.asarray(tab_game.legal_mask(st_t))
            mask_n = np.asarray(native.legal_mask(st_n))
            np.testing.assert_array_equal(mask_t, mask_n)
            assert int(tab_game.to_play(st_t)) == int(native.to_play(st_n))
            obs_t = np.asarray(tab_game.observe(st_t))
            obs_n = np.asarray(native.observe(st_n))
            np.testing.assert_allclose(obs_t, obs_n)
            a = int(rng.choice(np.flatnonzero(mask_t)))
            st_t = tab_game.step(st_t, jnp.asarray(a), jax.random.key(0))
            st_n = native.step(st_n, jnp.asarray(a), jax.random.key(0))


def test_tabulated_game_is_jittable(tab_game):
    from alphazero_tpu.search import mcts
    roots = jax.tree.map(lambda x: jnp.stack([x, x]), tab_game.init())
    res = jax.jit(lambda r, k: mcts.search(
        tab_game, mcts.random_oracle(tab_game), r, k,
        mcts.MCTSConfig(num_sims=16)))(roots, jax.random.key(0))
    assert int(np.asarray(res.root_visits).sum()) == 32
