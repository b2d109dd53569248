"""Cross-move subtree reuse (mcts.advance_root + warm-started search).

The array analogue of the reference's per-game transposition-table
persistence (``/root/reference/src/mcts.jl:124-151``): after a move, the
played child's subtree is compacted into fresh slabs and warm-starts the
next search.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu import envs, selfplay
from alphazero_tpu.envs import core
from alphazero_tpu.search import mcts
from alphazero_tpu.utils.schedules import ConstSchedule

C4 = envs.registry()["connect-four"]
AP = 8
A = 7


def _first_step(num_sims=150, cap=64):
    roots = C4.init_batch(4)
    oracle = mcts.random_oracle(C4)
    cfg = mcts.MCTSConfig(num_sims=num_sims, cpuct=2.0,
                          dirichlet_eps=0.25, dirichlet_alpha=1.0)

    @jax.jit
    def go(key):
        res = mcts.search(C4, oracle, roots, key, cfg)
        a = jnp.argmax(res.policy, -1).astype(jnp.int32)
        car, valid = mcts.advance_root(C4, res.tree, a, cap)
        s2 = jax.vmap(C4.step)(roots, a,
                               jax.random.split(jax.random.key(9), 4))
        return res, a, car, valid, s2

    return go(jax.random.key(1)), cfg


def test_advance_root_carries_child_stats():
    (res, a, car, valid, s2), _ = _first_step()
    assert np.asarray(valid).all()
    # slabs are lanes-minor since the round-5 flip; view lane-major here
    old = np.transpose(np.asarray(res.tree.stats), (0, 2, 1))
    new = np.transpose(np.asarray(car.stats), (0, 2, 1))
    child = old[0, np.arange(4), 2 * AP + np.asarray(a)].astype(int) - 1
    for b in range(4):
        # new root == old played child, stats preserved verbatim
        np.testing.assert_allclose(new[0, b, :A], old[child[b], b, :A])
        np.testing.assert_allclose(new[0, b, AP:AP + A],
                                   old[child[b], b, AP:AP + A])
    # stored root state matches the actually stepped state
    k_stored = np.asarray(jax.vmap(C4.canonical_key)(
        jax.tree.map(lambda x: x[0], car.states)))
    k_actual = np.asarray(jax.vmap(C4.canonical_key)(s2))
    assert (k_stored == k_actual).all()
    # remapped child pointers stay inside the kept prefix
    kept = new[:, :, 2 * AP:2 * AP + A]
    assert (kept <= 64).all() and (kept >= 0).all()


def test_warm_start_continues_visit_budget():
    (res, a, car, valid, s2), cfg = _first_step()
    res2 = jax.jit(lambda s, c, v, k: mcts.search(
        C4, mcts.random_oracle(C4), s, k, cfg, carried=(c, v)))(
            s2, car, valid, jax.random.key(2))
    carried_visits = np.asarray(car.stats)[0, AP:AP + A, :].sum(0)
    got = np.asarray(res2.root_visits).sum(-1)
    np.testing.assert_array_equal(got, carried_visits + cfg.num_sims)


def test_selfplay_with_reuse():
    for gname, sims in [("tictactoe", 48), ("connect-four", 64)]:
        g = envs.registry()[gname]
        cfg = mcts.MCTSConfig(num_sims=sims, cpuct=1.5, dirichlet_eps=0.25,
                              dirichlet_alpha=1.0, reuse_tree=True,
                              reuse_cap=32)
        tb = jax.jit(lambda k: selfplay.self_play_batch(
            g, mcts.random_oracle(g), cfg, ConstSchedule(1.0), 8, k))(
                jax.random.key(3))
        piv = np.asarray(tb.pi)[np.asarray(tb.valid)]
        assert np.allclose(piv.sum(-1), 1.0, atol=1e-5)
        assert (np.asarray(tb.num_moves) >= 5).all()


def test_reuse_not_weaker_head_to_head():
    """Equal 32-sim budget, rollout oracle: the warm-started player must not
    lose to the fresh-tree player (it carries extra visits per move)."""
    B, K, S = 16, 32, 32
    oracle = mcts.rollout_oracle(C4)
    rcfg = mcts.MCTSConfig(num_sims=S, cpuct=1.5, dirichlet_eps=0.15,
                           dirichlet_alpha=1.0, reuse_tree=True, reuse_cap=K)
    fcfg = mcts.MCTSConfig(num_sims=S, cpuct=1.5, dirichlet_eps=0.15,
                           dirichlet_alpha=1.0)

    @jax.jit
    def play_match(key, reuse_is_white):
        ctree, cvalid = mcts.empty_carry(C4, K, B)

        def body(carry, k):
            states, ctree, cvalid = carry
            k1, k3 = jax.random.split(k)
            done = jax.vmap(C4.terminated)(states)
            white_turn = jax.vmap(C4.to_play)(states) == core.WHITE
            reuse_turn = white_turn == reuse_is_white
            stored_key = jax.vmap(C4.canonical_key)(
                jax.tree.map(lambda x: x[0], ctree.states))
            cur_key = jax.vmap(C4.canonical_key)(states)
            cvalid = cvalid & jnp.all(stored_key == cur_key, axis=-1)
            rres = mcts.search(C4, oracle, states, k1, rcfg,
                               carried=(ctree, cvalid))
            fres = mcts.search(C4, oracle, states,
                               jax.random.fold_in(k1, 7), fcfg)
            a = jnp.where(reuse_turn, jnp.argmax(rres.policy, -1),
                          jnp.argmax(fres.policy, -1)).astype(jnp.int32)
            ctree, cvalid = mcts.advance_root(C4, rres.tree, a, K)
            cvalid = cvalid & ~done
            s2 = jax.vmap(C4.step)(states, a, jax.random.split(k3, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, states)
            rew = jnp.where(done, 0.0, jax.vmap(C4.reward)(s2))
            return (s2, ctree, cvalid), rew

        (_, _, _), rews = jax.lax.scan(
            body, (C4.init_batch(B), ctree, cvalid),
            jax.random.split(key, 42))
        tw = rews.sum(0)
        return jnp.where(reuse_is_white, tw, -tw)

    r = np.concatenate([np.asarray(play_match(jax.random.key(0), True)),
                        np.asarray(play_match(jax.random.key(1), False))])
    assert r.mean() > -0.1, f"reuse player lost head-to-head: {r.mean()}"


def test_warm_search_matches_recursive_reference():
    """Cross-move reuse parity vs the path-tree PyMCTS test oracle.

    Move 1: both implementations search S1 sims and play the visit argmax.
    The played child's subtree (untruncated) warm-starts move 2's search;
    visit counts and Q values must then match the recursive reference
    exactly -- this validates the carried interior statistics end to end
    (the advance_root structural tests alone don't exercise how a warm
    tree steers a subsequent search).
    """
    import functools
    from tests.mcts_ref import PyMCTS, PyTTT
    from tests.test_mcts import (exact_oracle_jax, exact_oracle_py,
                                 make_jax_roots, TTT)

    S1, S2 = 96, 96
    for gamma in (1.0, 0.9):
        cfg = mcts.MCTSConfig(num_sims=S1, cpuct=1.0, gamma=gamma,
                              dirichlet_eps=0.0)
        games = [PyTTT(), PyTTT().step(4).step(0)]
        roots = make_jax_roots(games)
        B = len(games)
        K = S1 + 1  # >= any subtree size: no truncation

        res1 = jax.jit(functools.partial(
            mcts.search, TTT, exact_oracle_jax, cfg=cfg))(
                roots=roots, rng=jax.random.key(0))
        a = jnp.argmax(res1.root_visits, -1).astype(jnp.int32)
        car, valid = jax.jit(functools.partial(
            mcts.advance_root, TTT, carry_cap=K))(
                tree=res1.tree, actions=a)
        assert np.asarray(valid).all()
        s2 = jax.vmap(TTT.step)(roots, a, jax.random.split(jax.random.key(1), B))
        res2 = jax.jit(functools.partial(
            mcts.search, TTT, exact_oracle_jax, cfg=cfg))(
                roots=s2, rng=jax.random.key(2), carried=(car, valid))

        for i, g in enumerate(games):
            ref = PyMCTS(g, exact_oracle_py, S1, cpuct=cfg.cpuct, gamma=gamma)
            ref.run()
            ai = int(np.argmax(ref.root.N))
            assert ai == int(np.asarray(a)[i])
            ref.root = ref.root.children[ai]   # reuse the played subtree
            ref.num_sims = S2
            ref.run()
            np.testing.assert_array_equal(
                np.asarray(res2.root_visits)[i], ref.root.N,
                err_msg=f"warm visit counts diverge (root {i}, gamma {gamma})")
            refq = ref.root.W / np.maximum(ref.root.N, 1)
            np.testing.assert_allclose(np.asarray(res2.root_q)[i], refq,
                                       atol=1e-5)
