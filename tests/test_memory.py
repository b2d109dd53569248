"""Replay buffer: circular semantics, trace conversion, position averaging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import memory
from alphazero_tpu import selfplay
from alphazero_tpu import envs
from alphazero_tpu.search import mcts
from alphazero_tpu.utils.schedules import ConstSchedule

TTT = envs.registry()["tictactoe"]


def _fake_samples(game, n, seed=0):
    """n random reachable states with dummy pi/z/t."""
    rng = np.random.default_rng(seed)
    states, pis, zs, ts = [], [], [], []
    s = game.init()
    for i in range(n):
        if bool(game.terminated(s)) or rng.random() < 0.3:
            s = game.init()
        legal = np.flatnonzero(np.asarray(game.legal_mask(s)))
        states.append(s)
        pi = np.zeros(game.num_actions, np.float32)
        pi[legal] = rng.dirichlet(np.ones(len(legal)))
        pis.append(pi)
        zs.append(rng.choice([-1.0, 0.0, 1.0]))
        ts.append(float(rng.integers(1, 9)))
        s = game.step(s, jnp.asarray(int(rng.choice(legal))), jax.random.key(i))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    keys = jax.vmap(game.canonical_key)(batch)
    return batch, jnp.asarray(np.stack(pis)), jnp.asarray(zs), \
        jnp.asarray(ts), keys


def test_push_and_wraparound():
    cap = 16
    rp = memory.init_replay(TTT, cap)
    st, pi, z, t, key = _fake_samples(TTT, 10)
    rp = memory.push(rp, st, pi, z, t, key, jnp.ones(10, bool))
    assert int(rp.size) == 10 and int(rp.ptr) == 10
    np.testing.assert_allclose(rp.z[:10], z)
    # push 10 more: wraps, oldest 4 evicted
    st2, pi2, z2, t2, key2 = _fake_samples(TTT, 10, seed=1)
    rp = memory.push(rp, st2, pi2, z2, t2, key2, jnp.ones(10, bool))
    assert int(rp.size) == 16
    np.testing.assert_allclose(rp.z[:4], z2[6:])   # wrapped tail
    np.testing.assert_allclose(rp.z[10:], z2[:6])
    # masked push drops invalid rows
    valid = jnp.asarray([True, False] * 5)
    rp2 = memory.push(memory.init_replay(TTT, cap), st, pi, z, t, key, valid)
    assert int(rp2.size) == 5
    np.testing.assert_allclose(rp2.z[:5], z[::2])


def test_push_overflowing_batch_keeps_newest():
    """One batch with more valid samples than the ring capacity must keep
    exactly the newest ``cap`` samples (no nondeterministic collisions)."""
    cap = 8
    rp = memory.init_replay(TTT, cap)
    st, pi, z, t, key = _fake_samples(TTT, 20)
    rp = memory.push(rp, st, pi, z, t, key, jnp.ones(20, bool))
    assert int(rp.size) == cap
    # newest 8 of the 20, laid out at (ptr + rank) % cap with ptr0=0:
    # ranks 12..19 land at slots 12%8..19%8 = 4..7,0..3
    expect = np.concatenate([z[16:20], z[12:16]])
    np.testing.assert_allclose(np.asarray(rp.z), expect)
    assert int(rp.ptr) == 20 % cap


def test_resize_keeps_newest():
    rp = memory.init_replay(TTT, 8)
    st, pi, z, t, key = _fake_samples(TTT, 8)
    rp = memory.push(rp, st, pi, z, t, key, jnp.ones(8, bool))
    small = memory.resize(TTT, rp, 4)
    assert small.capacity == 4 and int(small.size) == 4
    np.testing.assert_allclose(small.z[:4], z[4:])
    big = memory.resize(TTT, rp, 16)
    assert big.capacity == 16 and int(big.size) == 8
    np.testing.assert_allclose(big.z[:8], z)


def test_position_averaging():
    """merge_by_state semantics (``src/memory.jl:89-112``): identical states
    merged with averaged pi/z/t and summed counts."""
    game = TTT
    s0 = game.init()
    s1 = game.step(s0, jnp.asarray(4), jax.random.key(0))
    # three copies of s0, two of s1
    sts = jax.tree.map(lambda *x: jnp.stack(x), s0, s0, s0, s1, s1)
    A = game.num_actions
    pi = jnp.stack([jnp.full((A,), 1.0 / A)] * 3 +
                   [jnp.eye(A)[0], jnp.eye(A)[1]])
    z = jnp.asarray([1.0, 0.0, -1.0, 1.0, 0.0])
    t = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    key = jax.vmap(game.canonical_key)(sts)
    rp = memory.push(memory.init_replay(game, 8), sts, pi, z, t, key,
                     jnp.ones(5, bool))
    ds = memory.make_dataset(game, rp, use_symmetries=False,
                             use_position_averaging=True)
    assert int(ds.count) == 2
    n = np.asarray(ds.n_merged)
    zs = np.asarray(ds.z)
    order = np.argsort(n[:2])[::-1]  # s0 group (n=3) first
    assert list(n[:2][order]) == [3, 2]
    assert zs[:2][order][0] == pytest.approx(0.0)    # mean(1,0,-1)
    assert zs[:2][order][1] == pytest.approx(0.5)    # mean(1,0)
    pis = np.asarray(ds.pi)[:2][order]
    np.testing.assert_allclose(pis[1], 0.5 * (np.eye(A)[0] + np.eye(A)[1]),
                               atol=1e-6)
    # weights
    w = np.asarray(memory.sample_weights(ds, "LOG_WEIGHT"))
    np.testing.assert_allclose(
        sorted(w[:2], reverse=True),
        [np.log2(3) + 1, np.log2(2) + 1], rtol=1e-4)
    w_lin = np.asarray(memory.sample_weights(ds, "LINEAR_WEIGHT"))
    assert sorted(w_lin[:2], reverse=True) == [3.0, 2.0]


def test_symmetry_augmentation_count():
    game = TTT
    s0 = game.init()
    s1 = game.step(s0, jnp.asarray(0), jax.random.key(0))
    sts = jax.tree.map(lambda *x: jnp.stack(x), s0, s1)
    A = game.num_actions
    pi = jnp.stack([jnp.full((A,), 1.0 / A), jnp.eye(A)[1]])
    key = jax.vmap(game.canonical_key)(sts)
    rp = memory.push(memory.init_replay(game, 4), sts, pi,
                     jnp.zeros(2), jnp.ones(2), key, jnp.ones(2, bool))
    ds = memory.make_dataset(game, rp, use_symmetries=True,
                             use_position_averaging=True)
    # s0 is symmetric to itself (8 total copies -> 1 board);
    # s1 (corner move) has 8 dihedral images -> 4 distinct corner boards
    # + ... all images of a corner opening are corner openings: 4 distinct
    assert int(ds.count) == 1 + 4
    # total weight count conserved: 2 originals * (1 + 7 syms) = 16
    assert int(jnp.sum(ds.n_merged)) == 16


def test_selfplay_trace_to_samples():
    """z/t computation against hand-rolled expectations on a played batch."""
    game = TTT
    oracle = mcts.random_oracle(game)
    cfg = mcts.MCTSConfig(num_sims=8)
    tb = jax.jit(lambda k: selfplay.self_play_batch(
        game, oracle, cfg, ConstSchedule(1.0), 4, k))(jax.random.key(0))
    L, B = game.max_game_length, 4
    # samples flatten lane-major: [B, L]
    valid = np.asarray(tb.valid).reshape(B, L)
    z = np.asarray(tb.z).reshape(B, L)
    t = np.asarray(tb.t).reshape(B, L)
    wr = np.asarray(tb.white_reward)
    nm = np.asarray(tb.num_moves)
    players = np.asarray(jax.vmap(game.to_play)(tb.states)).reshape(B, L)
    for b in range(B):
        T = nm[b]
        assert valid[b, :T].all() and not valid[b, T:].any()
        # ttt: single terminal reward, so z_t = +-wr for all t
        for i in range(T):
            expect = wr[b] if players[b, i] == 0 else -wr[b]
            assert z[b, i] == pytest.approx(expect), (b, i)
            assert t[b, i] == pytest.approx(T - i)


def test_redundancy_helper():
    from alphazero_tpu.arena import _redundancy
    keys = jnp.asarray([[1, 2], [1, 2], [3, 4], [5, 6]], jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    # 2 unique among 3 valid -> 1 - 2/3
    assert float(_redundancy(keys, valid)) == pytest.approx(1 - 2 / 3)
