"""Batched MCTS validation.

1. Edge-for-edge parity with a straightforward recursive python MCTS
   (tests/mcts_ref.py) implementing the documented reference semantics
   (``/root/reference/src/mcts.jl:180-226``), using an exact-arithmetic
   deterministic oracle so that visit counts must match exactly.
2. Behavioral checks: tactical correctness (win/block detection) and
   vanilla-MCTS strength vs a random player (the spirit of
   ``/root/reference/test/mcts_vs_minmax.jl``).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import envs
from alphazero_tpu.envs import core
from alphazero_tpu.search import mcts
from tests.mcts_ref import PyMCTS, PyTTT

TTT = envs.registry()["tictactoe"]


def exact_oracle_jax(states, obs, mask):
    """Uniform prior over legal; V = (#white - #black)/10.

    Every quantity is computed by the same exact f32 ops as the numpy twin
    below, so PUCT scores are bit-identical between implementations.
    """
    del obs
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
    diff = (jnp.sum(states.board == 1, axis=(-1,)) -
            jnp.sum(states.board == 2, axis=(-1,))).astype(jnp.float32)
    v_white = diff / 10.0
    white = states.player == core.WHITE
    return p, jnp.where(white, v_white, -v_white)


def exact_oracle_py(game: PyTTT):
    legal = game.legal()
    p = legal.astype(np.float32)
    p = p / np.float32(max(p.sum(), 1.0))
    diff = np.float32((game.board == 1).sum() - (game.board == 2).sum())
    v_white = diff / np.float32(10.0)
    return p, v_white if game.player == 0 else -v_white


def make_jax_roots(py_games):
    states = []
    for g in py_games:
        states.append(TTT.init()._replace(
            board=jnp.asarray(g.board),
            player=jnp.asarray(g.player, jnp.int32),
            done=jnp.asarray(g.terminal()),
            rew=jnp.asarray(g.rew, jnp.float32)))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@pytest.mark.parametrize("gamma", [1.0, 0.9])
def test_parity_with_python_mcts(gamma):
    cfg = mcts.MCTSConfig(num_sims=100, cpuct=1.0, gamma=gamma,
                          dirichlet_eps=0.0)
    g_empty = PyTTT()
    g_mid = PyTTT().step(4).step(0).step(8)  # some mid-game position
    g_late = PyTTT().step(0).step(3).step(1).step(4)  # white threatens 0-1-2
    roots = make_jax_roots([g_empty, g_mid, g_late])
    res = jax.jit(
        lambda r, k: mcts.search(TTT, exact_oracle_jax, r, k, cfg)
    )(roots, jax.random.key(0))
    got_visits = np.asarray(res.root_visits)
    got_q = np.asarray(res.root_q)
    for i, g in enumerate([g_empty, g_mid, g_late]):
        ref = PyMCTS(g, exact_oracle_py, cfg.num_sims, cpuct=cfg.cpuct,
                     gamma=gamma)
        ref.run()
        np.testing.assert_array_equal(
            got_visits[i], ref.root.N,
            err_msg=f"visit counts diverge on root {i}")
        refq = ref.root.W / np.maximum(ref.root.N, 1)
        np.testing.assert_allclose(got_q[i], refq, atol=1e-5)


def test_finds_winning_and_blocking_moves():
    # white to play with two in a row -> must win at cell 2
    g_win = PyTTT().step(0).step(3).step(1).step(4)
    # black to play, white threatens 0-1-2 -> must block at 2
    g_block = PyTTT().step(0).step(3).step(1)
    roots = make_jax_roots([g_win, g_block])
    cfg = mcts.MCTSConfig(num_sims=200, cpuct=1.0)
    res = jax.jit(
        lambda r, k: mcts.search(TTT, exact_oracle_jax, r, k, cfg)
    )(roots, jax.random.key(1))
    pol = np.asarray(res.policy)
    assert pol[0].argmax() == 2, pol[0]
    assert pol[1].argmax() == 2, pol[1]
    # winning root should have strongly positive value estimate
    assert np.asarray(res.root_q)[0, 2] > 0.9


def test_dirichlet_noise_spreads_exploration():
    roots = make_jax_roots([PyTTT()])
    run = lambda eps, key: jax.jit(
        lambda r, k: mcts.search(
            TTT, exact_oracle_jax, r, k,
            mcts.MCTSConfig(num_sims=60, dirichlet_eps=eps,
                            dirichlet_alpha=0.5))
    )(roots, key)
    # with eps=1 the root prior is pure noise: different keys must give
    # different visit profiles, while eps=0 is deterministic
    v1 = np.asarray(run(1.0, jax.random.key(0)).root_visits)
    v2 = np.asarray(run(1.0, jax.random.key(7)).root_visits)
    d1 = np.asarray(run(0.0, jax.random.key(0)).root_visits)
    d2 = np.asarray(run(0.0, jax.random.key(7)).root_visits)
    assert (v1 != v2).any()
    np.testing.assert_array_equal(d1, d2)


def test_terminal_root_is_safe():
    g = PyTTT().step(0).step(3).step(1).step(4).step(2)  # white won
    assert g.terminal()
    roots = make_jax_roots([g])
    cfg = mcts.MCTSConfig(num_sims=16)
    res = jax.jit(
        lambda r, k: mcts.search(TTT, exact_oracle_jax, r, k, cfg)
    )(roots, jax.random.key(0))
    assert np.asarray(res.root_visits).sum() == 0


def test_prior_temperature():
    """prior_temperature=0 collapses the prior onto the best prior action."""
    def skew_oracle(states, obs, mask):
        p = mask.astype(jnp.float32) * jnp.arange(1.0, 10.0)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-9)
        return p, jnp.zeros(p.shape[:1], jnp.float32)

    roots = make_jax_roots([PyTTT()])
    cfg = mcts.MCTSConfig(num_sims=50, prior_temperature=0.05, cpuct=4.0)
    res = jax.jit(
        lambda r, k: mcts.search(TTT, skew_oracle, r, k, cfg)
    )(roots, jax.random.key(0))
    # nearly all visits should go to action 8 (highest prior)
    v = np.asarray(res.root_visits)[0]
    assert v[8] > 0.7 * v.sum()


@pytest.mark.slow
def test_vanilla_mcts_beats_random():
    """Rollout-oracle MCTS (vanilla MCTS) crushes a uniform-random player.

    Spirit of ``/root/reference/test/mcts_vs_minmax.jl`` at reduced size.
    """
    B = 32
    cfg = mcts.MCTSConfig(num_sims=64, cpuct=1.0)
    oracle = mcts.rollout_oracle(TTT)

    @jax.jit
    def play_match(key, mcts_is_white):
        def body(carry, key):
            states = carry
            done = jax.vmap(TTT.terminated)(states)
            to_play = jax.vmap(TTT.to_play)(states)
            k1, k2, k3 = jax.random.split(key, 3)
            res = mcts.search(TTT, oracle, states, k1, cfg)
            mcts_turn = (to_play == 0) == mcts_is_white
            legal = jax.vmap(TTT.legal_mask)(states).astype(jnp.float32)
            rand_pi = legal / jnp.maximum(legal.sum(-1, keepdims=True), 1.0)
            pi = jnp.where(mcts_turn[:, None], res.policy, rand_pi)
            greedy = jax.nn.one_hot(jnp.argmax(pi, -1), 9)
            pi = jnp.where(mcts_turn[:, None], greedy, pi)  # greedy for MCTS
            a = jax.vmap(core.sample_from)(pi, jax.random.split(k2, B))
            s2 = jax.vmap(TTT.step)(states, a, jax.random.split(k3, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, states)
            rew = jnp.where(done, 0.0, jax.vmap(TTT.reward)(s2))
            return s2, rew

        s0 = TTT.init_batch(B)
        _, rews = jax.lax.scan(body, s0, jax.random.split(key, 9))
        total_white = rews.sum(0)
        return jnp.where(mcts_is_white, total_white, -total_white)

    r_as_white = np.asarray(play_match(jax.random.key(0), True))
    r_as_black = np.asarray(play_match(jax.random.key(1), False))
    avg = np.concatenate([r_as_white, r_as_black]).mean()
    assert avg > 0.5, f"vanilla MCTS too weak vs random: avg reward {avg}"


def test_staged_search_is_bit_identical():
    """Staged tree growth (MCTSConfig.stages) is a pure layout optimization:
    results must match the single-stage loop bit for bit."""
    C4 = envs.registry()["connect-four"]
    B = 8
    key = jax.random.key(7)
    roots = C4.init_batch(B)
    for _ in range(3):
        key, k2, k3 = jax.random.split(key, 3)
        legal = jax.vmap(C4.legal_mask)(roots).astype(jnp.float32)
        a = jax.vmap(core.sample_from)(legal, jax.random.split(k2, B))
        roots = jax.vmap(C4.step)(roots, a, jax.random.split(k3, B))
    oracle = mcts.random_oracle(C4)
    outs = []
    for stages in (1, 4):
        cfg = mcts.MCTSConfig(num_sims=160, cpuct=2.0, dirichlet_eps=0.25,
                              dirichlet_alpha=1.0, stages=stages)
        res = jax.jit(functools.partial(mcts.search, C4, oracle, cfg=cfg))(
            roots, jax.random.key(3))
        outs.append(res)
    assert np.array_equal(np.asarray(outs[0].policy),
                          np.asarray(outs[1].policy))
    assert np.array_equal(np.asarray(outs[0].root_visits),
                          np.asarray(outs[1].root_visits))
    assert np.array_equal(np.asarray(outs[0].root_q),
                          np.asarray(outs[1].root_q))


def test_depth_cap():
    """A cap >= the game-length bound is a no-op; a tight cap still returns
    a full visit budget (capped descents backprop stored values)."""
    C4 = envs.registry()["connect-four"]
    B = 4
    roots = C4.init_batch(B)
    oracle = mcts.random_oracle(C4)

    def run(md):
        cfg = mcts.MCTSConfig(num_sims=150, cpuct=2.0, max_depth=md)
        return jax.jit(functools.partial(mcts.search, C4, oracle, cfg=cfg))(
            roots, jax.random.key(5))

    res_none, res_large, res_tight = run(None), run(99), run(6)
    assert np.array_equal(np.asarray(res_none.policy),
                          np.asarray(res_large.policy))
    # every simulation adds exactly one root visit regardless of the cap
    assert np.asarray(res_tight.root_visits).sum(-1).tolist() == [150] * B
    # the capped search must stay tactically sound
    assert np.all(np.asarray(res_tight.policy).sum(-1) > 0.99)


def test_dense_update_matches_scatter():
    """The dense one-hot-matmul update (MCTSConfig.update='dense') computes
    the same statistics as the flat scatter-add, up to float summation
    order: visit counts and child pointers exactly, qsums to tolerance."""
    C4 = envs.registry()["connect-four"]
    B = 8
    roots = C4.init_batch(B)
    oracle = mcts.random_oracle(C4)
    outs = []
    for update in ("scatter", "dense"):
        cfg = mcts.MCTSConfig(num_sims=160, cpuct=2.0, dirichlet_eps=0.25,
                              dirichlet_alpha=1.0, update=update)
        res = jax.jit(functools.partial(mcts.search, C4, oracle, cfg=cfg))(
            roots, jax.random.key(3))
        outs.append(res)
    # visits/child pointers are integer-exact; a rare PUCT argmax tie-break
    # flip from qsum rounding would change them, so equality here validates
    # both the counts and (implicitly) the q fidelity along the search
    assert np.array_equal(np.asarray(outs[0].root_visits),
                          np.asarray(outs[1].root_visits))
    np.testing.assert_allclose(np.asarray(outs[0].root_q),
                               np.asarray(outs[1].root_q),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0].policy),
                               np.asarray(outs[1].policy),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Intermediate-reward parity: a deterministic 1-player line MDP where most
# rewards arrive on NON-terminal transitions (unlike the board games, whose
# rewards are terminal-only).  This specifically exercises the per-edge
# reward recording during the descent and the expansion-edge splice.
# ---------------------------------------------------------------------------


class _LineState(NamedTuple):
    pos: jnp.ndarray     # i32, 0..6
    last_r: jnp.ndarray  # f32 reward of the last transition (white POV)
    t: jnp.ndarray       # i32 moves played


def _line_game():
    MAXT = 12

    def init():
        return _LineState(jnp.asarray(3, jnp.int32), jnp.asarray(0.0),
                          jnp.asarray(0, jnp.int32))

    def step(s, a, key):
        del key
        pos = s.pos + jnp.where(a == 1, 1, -1).astype(jnp.int32)
        r = jnp.where(a == 1,
                      jnp.where(pos == 6, 1.0, 0.3),
                      jnp.where(pos == 0, -1.0, -0.1)).astype(jnp.float32)
        return _LineState(pos, r, s.t + 1)

    return core.Game(
        name="line", num_actions=2, obs_shape=(7,), two_players=False,
        max_game_length=MAXT, key_size=1, num_symmetries=1,
        init=init, step=step,
        observe=lambda s: jax.nn.one_hot(s.pos, 7, dtype=jnp.float32),
        legal_mask=lambda s: jnp.ones((2,), bool),
        terminated=lambda s: (s.pos == 0) | (s.pos == 6) | (s.t >= MAXT),
        reward=lambda s: s.last_r,
        to_play=lambda s: jnp.asarray(0, jnp.int32),
        canonical_key=lambda s: (s.pos * 16 + s.t)[None].astype(jnp.int32),
    )


class _PyLine:
    A = 2
    player = 0

    def __init__(self, pos=3, rew=0.0, t=0):
        self.pos, self.rew, self.t = pos, np.float32(rew), t

    def terminal(self):
        return self.pos in (0, 6) or self.t >= 12

    def legal(self):
        return np.ones(2, bool)

    def step(self, a):
        pos = self.pos + (1 if a == 1 else -1)
        if a == 1:
            r = 1.0 if pos == 6 else 0.3
        else:
            r = -1.0 if pos == 0 else -0.1
        return _PyLine(pos, r, self.t + 1)


@pytest.mark.parametrize("gamma", [1.0, 0.9])
def test_parity_intermediate_rewards(gamma):
    game = _line_game()

    def oracle_jax(states, obs, mask):
        p = jnp.full(mask.shape, 0.5, jnp.float32)
        v = (states.pos.astype(jnp.float32) - 3.0) / 6.0
        return p, v

    def oracle_py(g):
        return np.full(2, 0.5, np.float32), np.float32((g.pos - 3.0) / 6.0)

    cfg = mcts.MCTSConfig(num_sims=80, cpuct=1.25, gamma=gamma,
                          dirichlet_eps=0.0)
    roots = jax.tree.map(lambda x: x[None], game.init())
    res = jax.jit(
        lambda r, k: mcts.search(game, oracle_jax, r, k, cfg)
    )(roots, jax.random.key(0))

    ref = PyMCTS(_PyLine(), oracle_py, cfg.num_sims, cpuct=cfg.cpuct,
                 gamma=gamma)
    ref.run()
    np.testing.assert_array_equal(np.asarray(res.root_visits)[0], ref.root.N)
    refq = ref.root.W / np.maximum(ref.root.N, 1)
    np.testing.assert_allclose(np.asarray(res.root_q)[0], refq, atol=1e-5)


def test_onehot_gather_is_bit_identical():
    """``MCTSConfig.gather="onehot"`` (masked-reduction row lookup) must
    produce bit-identical search results to the XLA-gather path."""
    from alphazero_tpu.envs import registry
    from alphazero_tpu.search import mcts as M
    game = registry()["connect-four"]
    s0 = game.init_batch(16, jax.random.key(5))
    oracle = M.random_oracle(game)
    outs = []
    for gather in ("take", "onehot"):
        cfg = M.MCTSConfig(num_sims=48, cpuct=2.0, dirichlet_eps=0.25,
                           gather=gather)
        res = jax.jit(lambda s, k: M.search(game, oracle, s, k, cfg))(
            s0, jax.random.key(6))
        outs.append(res)
    np.testing.assert_array_equal(np.asarray(outs[0].root_visits),
                                  np.asarray(outs[1].root_visits))
    np.testing.assert_array_equal(np.asarray(outs[0].policy),
                                  np.asarray(outs[1].policy))
    np.testing.assert_array_equal(np.asarray(outs[0].tree.stats),
                                  np.asarray(outs[1].tree.stats))


def test_truncated_rollout_oracle_bootstrap():
    """max_plies truncation: a 0-ply "playout" must return exactly the
    tanh-squashed white-POV heuristic; a full-length max_plies reproduces
    the untruncated oracle bit-for-bit; terminated states stay value-0."""
    M = envs.registry()["mancala"]
    B = 8
    states = M.init_batch(B)
    # play a few deterministic moves so heuristics are nonzero
    rng = jax.random.key(3)
    for a in (0, 2, 4):
        acts = jnp.full((B,), a)
        rng, k = jax.random.split(rng)
        states = jax.vmap(M.step)(states, acts, jax.random.split(k, B))
    obs = jax.vmap(M.observe)(states)
    mask = jax.vmap(M.legal_mask)(states)

    # 0-ply truncation: pure bootstrap
    zero = mcts.rollout_oracle(M, max_plies=0)
    _, v0 = jax.jit(zero)(states, obs, mask)
    hv = jax.vmap(M.heuristic_value)(states)
    hv_white = jnp.where(jax.vmap(M.to_play)(states) == core.WHITE, hv, -hv)
    white = jax.vmap(M.to_play)(states) == core.WHITE
    expect = jnp.where(white, jnp.tanh(hv_white), -jnp.tanh(hv_white))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(expect), atol=1e-6)

    # full-length max_plies == no truncation (bit-identical playouts)
    full = mcts.rollout_oracle(M)
    capped = mcts.rollout_oracle(M, max_plies=M.max_game_length)
    _, vf = jax.jit(full)(states, obs, mask)
    _, vc = jax.jit(capped)(states, obs, mask)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vc))

    # truncated values stay in the terminal-reward range
    tr = mcts.rollout_oracle(M, max_plies=42)
    _, vt = jax.jit(tr)(states, obs, mask)
    assert np.all(np.abs(np.asarray(vt)) <= 1.0 + 1e-6)

    # games without a heuristic cannot be truncated
    import dataclasses as DC
    g2 = DC.replace(M, heuristic_value=None)
    with pytest.raises(ValueError, match="heuristic_value"):
        mcts.rollout_oracle(g2, max_plies=42)
