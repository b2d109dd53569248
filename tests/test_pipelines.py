"""Pipeline smoke tests for EVERY registered experiment (the reference's
``dummy_run`` strategy, ``src/scripts/dummy_run.jl:67-74``, extended to the
full registry), plus MCTS-on-stochastic-game coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import experiments, training
from alphazero_tpu.envs import registry


@pytest.mark.parametrize("name", sorted(experiments.registry()))
def test_dummy_run_every_experiment(name, tmp_path):
    """Session-level dummy run: self-play, learning, gating (two-player
    arena or the 1-player ``compare_networks`` branch), benchmark,
    checkpoint save — for every registered experiment."""
    from alphazero_tpu.session import Session
    exp = experiments.dummy_run_experiment(experiments.registry()[name])
    s = Session(exp, dir=str(tmp_path / name), quiet=True, seed=0)
    s.resume()
    assert s.env.itc == exp.params.num_iters
    assert int(s.env.replay.size) > 0
    # gating ran (either branch) and produced a checkpoint report
    import json
    import os
    with open(os.path.join(s.dir, "reports", "iter_1.json")) as f:
        rep = json.load(f)
    cks = rep["learning"]["checkpoints"]
    assert len(cks) == exp.params.learning.num_checkpoints
    ev = cks[0]["evaluation"]
    assert ev is not None and np.isfinite(ev["avgr"])
    if not exp.game.two_players:
        # the 1-player branch reports baseline rewards too
        # (``training.jl:159-174``)
        assert ev["baseline_rewards"] is not None


def test_grid_world_one_player_compare_networks():
    """The 1-player gating branch (``training.jl:159-174``): contender and
    baseline each play their own Singles; avgr is the difference."""
    exp = experiments.dummy_run_experiment(
        experiments.registry()["grid-world"])
    env = training.AZEnv.create(exp.game, exp.netspec, exp.params, seed=0)
    rep = training.compare_networks(env, env.curnn, env.bestnn,
                                    training.Handlers())
    # identical networks, different seeds: finite avgr, baselines recorded
    assert np.isfinite(rep.avgr)
    assert rep.baseline_rewards is not None
    assert len(rep.rewards) == exp.params.arena.sim.num_games


def test_mcts_on_stochastic_game():
    """Batched MCTS on grid-world: stochastic transitions thread RNG keys
    through ``game.step`` inside the search (SURVEY §7 'hard parts')."""
    from alphazero_tpu.search import mcts
    game = registry()["grid-world"]
    B = 32
    s0 = game.init_batch(B, jax.random.key(0))
    cfg = mcts.MCTSConfig(num_sims=24, gamma=0.97)
    oracle = mcts.random_oracle(game)
    run = jax.jit(lambda s, k: mcts.search(game, oracle, s, k, cfg))
    res1 = run(s0, jax.random.key(1))
    res2 = run(s0, jax.random.key(1))
    # deterministic under a fixed key, despite stochastic transitions
    np.testing.assert_array_equal(np.asarray(res1.policy),
                                  np.asarray(res2.policy))
    pol = np.asarray(res1.policy)
    assert pol.shape == (B, game.num_actions)
    # lanes whose random start is already terminal absorb every descent
    # (zero visits); all others carry a normalized visit policy
    live = ~np.asarray(jax.vmap(game.terminated)(s0))
    assert live.sum() > B // 2
    np.testing.assert_allclose(pol[live].sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(res1.root_visits)[live].sum(-1)
            == cfg.num_sims).all()
    assert (pol[~live] == 0).all()


def test_mcts_beats_random_on_grid_world():
    """Strength: rollout-oracle MCTS reaches the grid-world goal with a
    higher (discounted) reward than a uniform-random walker."""
    from alphazero_tpu import arena as A
    from alphazero_tpu.config import MctsParams, SimParams
    game = registry()["grid-world"]
    sim = SimParams(num_games=64, num_lanes=64)
    mp = MctsParams(num_iters_per_turn=48, gamma=0.97, cpuct=1.0)
    mcts_item = A.Single(A.MctsRollouts(mp), sim)
    rand_item = A.Single(A.RandomPlayerSpec(), sim)
    ev_m = A.run_benchmark_item(game, None, None, mcts_item,
                                jax.random.key(0), gamma=0.97)
    ev_r = A.run_benchmark_item(game, None, None, rand_item,
                                jax.random.key(0), gamma=0.97)
    assert ev_m.avgr > ev_r.avgr + 0.1, (ev_m.avgr, ev_r.avgr)


def test_check_params_extended():
    from alphazero_tpu import config as cfgmod
    exp = experiments.registry()["connect-four"]
    errors, warnings = cfgmod.check_params(exp.game, exp.params)
    assert not errors
    import dataclasses
    # a bad gating threshold is rejected
    bad = dataclasses.replace(
        exp.params, arena=dataclasses.replace(exp.params.arena,
                                              update_threshold=2.0))
    errors, _ = cfgmod.check_params(exp.game, bad)
    assert any("update_threshold" in e for e in errors)
    # use_symmetries without a symmetrize hook is rejected
    gw = experiments.registry()["grid-world"]
    bad = dataclasses.replace(gw.params, use_symmetries=True)
    errors, _ = cfgmod.check_params(gw.game, bad)
    assert any("symmetrize" in e for e in errors)
    # gumbel experiment passes the checks too
    ge = experiments.registry()["connect-four-gumbel"]
    errors, _ = cfgmod.check_params(ge.game, ge.params)
    assert not errors
