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
