"""End-to-end pipeline smoke test (the "dummy run") + loss unit checks.

The dummy run mirrors ``/root/reference/src/scripts/dummy_run.jl``: the whole
real pipeline — self-play, replay, learning with arena gating — with every
size knob shrunk to a minimum, on CPU JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import experiments, report as R, training
from alphazero_tpu.ops import losses as L


def test_loss_decomposition_by_hand():
    """Exact check of ``losses`` against a hand computation
    (``src/learning.jl:59-90``)."""
    W = jnp.asarray([1.0, 2.0])
    P = jnp.asarray([[0.5, 0.5, 0.0], [1.0, 0.0, 0.0]])
    V = jnp.asarray([1.0, -1.0])
    phat = jnp.asarray([[0.25, 0.25, 0.5], [0.5, 0.25, 0.25]])
    pinv = jnp.asarray([0.1, 0.2])
    vhat = jnp.asarray([0.5, -0.5])
    params = {"w": jnp.asarray([1.0, 2.0])}
    hp = L.LossHP(l2_regularization=0.01, nonvalidity_penalty=2.0,
                  rewards_renormalization=1.0)
    Wmean, Hp = 1.5, 0.2
    parts = L.losses(phat, pinv, vhat, params, hp, Wmean, Hp, W, P, V)
    ce = [-(0.5 * np.log(0.25 + L.EPS) + 0.5 * np.log(0.25 + L.EPS)),
          -np.log(0.5 + L.EPS)]
    lp = (1 * ce[0] + 2 * ce[1]) / 3 - Hp
    lv = (1 * 0.25 + 2 * 0.25) / 3
    lreg = 0.01 * (1 + 4)
    linv = 2.0 * (1 * 0.1 + 2 * 0.2) / 3
    assert float(parts.Lp) == pytest.approx(lp, rel=1e-5)
    assert float(parts.Lv) == pytest.approx(lv, rel=1e-5)
    assert float(parts.Lreg) == pytest.approx(lreg, rel=1e-5)
    assert float(parts.Linv) == pytest.approx(linv, rel=1e-5)
    total = (np.mean([1, 2]) / Wmean) * (lp + lv + lreg + linv)
    assert float(parts.L) == pytest.approx(total, rel=1e-5)


class _Recorder(training.Handlers):
    def __init__(self):
        self.events = []

    def self_play_finished(self, env, rep):
        self.events.append(("self_play", rep))

    def checkpoint_finished(self, env, rep):
        self.events.append(("checkpoint", rep))

    def iteration_finished(self, env, rep):
        self.events.append(("iteration", rep))

    def training_finished(self, env):
        self.events.append(("done", None))


def test_dummy_run_tictactoe():
    exp = experiments.dummy_run_experiment(
        experiments.registry()["tictactoe"])
    env = training.AZEnv.create(exp.game, exp.netspec, exp.params, seed=0)
    init = training.initial_report(env)
    assert init.num_network_parameters > 1000
    assert not init.errors
    rec = _Recorder()
    training.train(env, rec)
    kinds = [k for k, _ in rec.events]
    assert kinds.count("iteration") == 2
    assert kinds.count("self_play") == 2
    assert kinds.count("checkpoint") == 2
    assert kinds[-1] == "done"
    assert env.itc == 2
    assert int(env.replay.size) > 0
    # iteration report structure is fully populated
    it = [r for k, r in rec.events if k == "iteration"][-1]
    assert isinstance(it, R.Iteration)
    assert it.self_play.samples_gen_speed > 0
    assert it.learning.initial_status.loss.L != 0
    assert len(it.learning.checkpoints) == 1
    ev = it.learning.checkpoints[0].evaluation
    assert ev is not None and len(ev.rewards) >= 2
    assert 0.0 <= ev.redundancy <= 1.0
    # JSON round-trip of the report
    import json
    blob = json.dumps(R.to_dict(it))
    assert "samples_gen_speed" in blob


def test_benchmark_duel_small():
    from alphazero_tpu import arena as A
    from alphazero_tpu.config import MctsParams, SimParams
    exp = experiments.registry()["tictactoe"]
    env = training.AZEnv.create(exp.game, exp.netspec, exp.params, seed=1)
    duel = A.Duel(
        A.MctsRollouts(MctsParams(num_iters_per_turn=24, cpuct=1.0)),
        A.RandomPlayerSpec(),
        SimParams(num_games=16, num_lanes=16, alternate_colors=True))
    ev = A.run_benchmark_item(exp.game, exp.netspec, env.bestnn, duel,
                              jax.random.key(0))
    assert ev.avgr > 0.2, f"MCTS should beat random, got {ev.avgr}"
    won, draw, lost = A.ternary_stats(ev.rewards)
    assert won + draw + lost == 16 and won > lost
