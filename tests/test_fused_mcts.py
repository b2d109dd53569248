"""Pallas fused update+select kernel: bit-parity with the XLA search path.

Runs the kernel in interpreter mode on CPU; small sizes keep it fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import envs
from alphazero_tpu.search import mcts
from tests.mcts_ref import PyTTT
from tests.test_mcts import exact_oracle_jax, make_jax_roots

TTT = envs.registry()["tictactoe"]


@pytest.mark.parametrize("gamma", [1.0, 0.9])
def test_fused_matches_xla(gamma):
    g_empty = PyTTT()
    g_mid = PyTTT().step(4).step(0).step(8)
    g_done = PyTTT().step(0).step(3).step(1).step(4).step(2)  # terminal
    roots = make_jax_roots([g_empty, g_mid, g_done, g_empty])
    for eps in (0.0, 0.5):
        cfg_x = mcts.MCTSConfig(num_sims=40, cpuct=1.0, gamma=gamma,
                                dirichlet_eps=eps, fused=False)
        cfg_f = mcts.MCTSConfig(num_sims=40, cpuct=1.0, gamma=gamma,
                                dirichlet_eps=eps, fused=True)
        rx = jax.jit(lambda r, k: mcts.search(
            TTT, exact_oracle_jax, r, k, cfg_x))(roots, jax.random.key(3))
        rf = jax.jit(lambda r, k: mcts.search(
            TTT, exact_oracle_jax, r, k, cfg_f))(roots, jax.random.key(3))
        np.testing.assert_array_equal(
            np.asarray(rx.root_visits), np.asarray(rf.root_visits),
            err_msg=f"visits diverge (eps={eps})")
        np.testing.assert_allclose(
            np.asarray(rx.root_q), np.asarray(rf.root_q), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rx.tree.stats), np.asarray(rf.tree.stats), atol=1e-4)
        assert int(rx.nodes_traversed) == int(rf.nodes_traversed)


def test_pallas_select_matches_xla_descent():
    """The standalone Pallas descent kernel (ops/fused_mcts.pallas_select,
    not wired into the search loop — see MCTSConfig.fused) must agree with
    the XLA ``_select`` on a mid-search tree: same expansion edges, paths,
    and depths.  Interpret mode on CPU."""
    from alphazero_tpu.ops import fused_mcts as FM

    cfg = mcts.MCTSConfig(num_sims=24, cpuct=1.25, dirichlet_eps=0.0,
                          stages=1)
    roots = make_jax_roots([PyTTT(), PyTTT().step(4), PyTTT().step(0)])
    B = 3
    # build a partially grown tree by running a real search
    res = jax.jit(
        lambda r, k: mcts.search(TTT, exact_oracle_jax, r, k, cfg)
    )(roots, jax.random.key(0))
    tree = res.tree
    A = TTT.num_actions
    ap = mcts._pad_width(A)
    max_depth = TTT.max_game_length + 1
    eta = jnp.zeros((B, A))

    sel = mcts._select(tree, eta, cfg, max_depth, A)
    # the tree is natively lanes-minor since the round-5 layout flip
    out = FM.pallas_select(
        tree.stats, tree.prior_legal, tree.meta,
        eta.T, max_depth=max_depth, cpuct=cfg.cpuct,
        eps=cfg.dirichlet_eps, interpret=True)

    np.testing.assert_array_equal(np.asarray(sel.expand_parent),
                                  np.asarray(out.expand_parent))
    np.testing.assert_array_equal(np.asarray(sel.expand_action),
                                  np.asarray(out.expand_action))
    np.testing.assert_array_equal(np.asarray(sel.depth),
                                  np.asarray(out.depth))
    d = int(np.asarray(sel.depth).max())
    np.testing.assert_array_equal(np.asarray(sel.path_nodes)[:, :d],
                                  np.asarray(out.path_nodes)[:, :d])
    np.testing.assert_array_equal(np.asarray(sel.path_actions)[:, :d],
                                  np.asarray(out.path_actions)[:, :d])


@pytest.mark.parametrize("eps", [0.0, 0.5])
def test_pallas_descent_search_matches_xla(eps):
    """END-TO-END search parity of the production descent engines: the
    full search() with descent="pallas" (the TPU default since the
    round-5 layout flip; interpret mode here) must be bit-identical to
    descent="xla" — same visit counts, q-values, and final slabs."""
    roots = make_jax_roots([PyTTT(), PyTTT().step(4).step(0),
                            PyTTT().step(0).step(3).step(1).step(4).step(2),
                            PyTTT().step(8)])
    base = dict(num_sims=32, cpuct=1.25, dirichlet_eps=eps, stages=1)
    cx = mcts.MCTSConfig(**base, descent="xla")
    cp = mcts.MCTSConfig(**base, descent="pallas")
    rx = jax.jit(lambda r, k: mcts.search(
        TTT, exact_oracle_jax, r, k, cx))(roots, jax.random.key(5))
    rp = jax.jit(lambda r, k: mcts.search(
        TTT, exact_oracle_jax, r, k, cp))(roots, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(rx.root_visits),
                                  np.asarray(rp.root_visits))
    np.testing.assert_allclose(np.asarray(rx.root_q),
                               np.asarray(rp.root_q), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rx.tree.stats),
                                  np.asarray(rp.tree.stats))
    assert int(rx.nodes_traversed) == int(rp.nodes_traversed)


def test_pallas_descent_depth_cap_matches_xla():
    """Depth-capped searches (the flagship self-play config uses
    max_depth=16) must agree between engines, including the capped-lane
    leaf-value bootstrap."""
    roots = make_jax_roots([PyTTT(), PyTTT().step(4)])
    base = dict(num_sims=48, cpuct=1.0, dirichlet_eps=0.0, stages=1,
                max_depth=3)
    cx = mcts.MCTSConfig(**base, descent="xla")
    cp = mcts.MCTSConfig(**base, descent="pallas")
    rx = jax.jit(lambda r, k: mcts.search(
        TTT, exact_oracle_jax, r, k, cx))(roots, jax.random.key(11))
    rp = jax.jit(lambda r, k: mcts.search(
        TTT, exact_oracle_jax, r, k, cp))(roots, jax.random.key(11))
    np.testing.assert_array_equal(np.asarray(rx.root_visits),
                                  np.asarray(rp.root_visits))
    np.testing.assert_array_equal(np.asarray(rx.tree.stats),
                                  np.asarray(rp.tree.stats))
