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
    out = FM.pallas_select(
        jnp.transpose(tree.stats, (0, 2, 1)),
        jnp.transpose(tree.prior_legal, (0, 2, 1)),
        jnp.transpose(tree.meta, (0, 2, 1)),
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
