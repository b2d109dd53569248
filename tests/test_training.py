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


def test_cross_architecture_duel():
    """``play_duel`` can pit two DIFFERENT network architectures against
    each other (the reference's two-net inference server capability,
    ``src/simulations.jl:70-99``): SimpleNet agent vs ResNet agent."""
    from alphazero_tpu import arena as A
    from alphazero_tpu.config import MctsParams, SimParams
    from alphazero_tpu.envs import registry
    from alphazero_tpu.models import ResNetSpec, SimpleNetSpec
    from alphazero_tpu.models.interface import Network

    game = registry()["tictactoe"]
    spec_a = SimpleNetSpec(width=16, depth_common=1)
    spec_b = ResNetSpec(num_filters=8, num_blocks=1)
    net_a = Network(game, spec_a).init(jax.random.key(0))
    net_b = Network(game, spec_b).init(jax.random.key(1))
    mp = MctsParams(num_iters_per_turn=8)
    res = A.play_duel(
        game, spec_a, A.Full(mp), A.Full(mp),
        SimParams(num_games=8, num_lanes=8, alternate_colors=True),
        net_a, net_b, jax.random.key(2), netspec_b=spec_b)
    r = np.asarray(res.rewards)
    assert r.shape == (8,) and np.all(np.isin(r, [-1.0, 0.0, 1.0]))
    # and a NetworkOnly-vs-Full cross-arch pairing also compiles/runs
    res2 = A.play_duel(
        game, spec_a, A.NetworkOnly(), A.Full(mp),
        SimParams(num_games=8, num_lanes=8, alternate_colors=True),
        net_a, net_b, jax.random.key(3), netspec_b=spec_b)
    assert np.asarray(res2.rewards).shape == (8,)


def test_bn_imprinting_survives_sorted_padded_dataset():
    """``learning_status`` must leave the network's batch-norm running
    statistics representative of the *valid data* — not of the sorted tail
    or the zero padding of the merged dataset.  Regression test for the
    flagship-run bug where eval-mode inference (arena/benchmarks) saw BN
    stats imprinted by hundreds of all-padding chunks and produced a
    constant-biased value head (see learning.py ``learning_status``)."""
    import dataclasses

    from alphazero_tpu import config as cfgmod
    from alphazero_tpu import learning as learnmod
    from alphazero_tpu import memory as memmod
    from alphazero_tpu.envs import registry
    from alphazero_tpu.models import Adam, SimpleNetSpec
    from alphazero_tpu.models.interface import Network
    from alphazero_tpu.selfplay import self_play_batch
    from alphazero_tpu.search import mcts
    from alphazero_tpu.utils.schedules import ConstSchedule

    game = registry()["tictactoe"]
    spec = SimpleNetSpec(width=32, depth_common=1, use_batch_norm=True)
    network = Network(game, spec)
    net = network.init(jax.random.key(0))

    # real self-play data in a replay padded far beyond the sample count,
    # so most status chunks would be pure padding without the fix
    cfg = mcts.MCTSConfig(num_sims=8)
    tb = self_play_batch(game, mcts.random_oracle(game), cfg,
                         ConstSchedule(1.0), 256, jax.random.key(1))
    replay = memmod.init_replay(game, 8192)
    replay = memmod.push(replay, tb.states, tb.pi, tb.z, tb.t, tb.key,
                         tb.valid)
    assert int(replay.size) < 3000  # mostly padding

    lp = cfgmod.LearningParams(
        optimiser=Adam(lr=1e-3), l2_regularization=0.0,
        batch_size=32, loss_computation_batch_size=256,
        min_checkpoints_per_epoch=0, max_batches_per_checkpoint=4,
        num_checkpoints=1)
    trainer = learnmod.Trainer(game, spec, net, replay, lp,
                               use_symmetries=False, rng=jax.random.key(2))
    trainer.batch_updates(8)      # move params/stats off their init values
    net1 = trainer.state.net
    trainer.learning_status()     # the imprint pass under test
    net2 = trainer.state.net

    # ground truth: a long manual imprint over *shuffled valid* merged
    # samples, starting from the same pre-status network
    from alphazero_tpu.models.interface import NetState
    ds = trainer.dataset
    count = int(ds.count)
    rng = np.random.default_rng(0)
    stats = net1.batch_stats
    for _ in range(40):
        idx = rng.choice(count, 256, replace=False)
        st = jax.tree.map(lambda x: x[idx], ds.states)
        o = jax.vmap(game.observe)(st)
        m = jax.vmap(game.legal_mask)(st)
        _, _, _, stats = network.forward_normalized(
            NetState(net1.params, stats), o, m, train=True)
    ref = NetState(net2.params, stats)

    # eval-mode outputs under the scan-imprinted stats must match the
    # ground-truth imprint; under the old sequential/padded scan they were
    # the statistics of all-zero boards and diverged wildly
    n = int(replay.size)
    states = jax.tree.map(lambda x: x[:n], replay.states)
    obs = jax.vmap(game.observe)(states)
    mask = jax.vmap(game.legal_mask)(states)
    _, _, v_scan, _ = network.forward_normalized(net2, obs, mask)
    _, _, v_ref, _ = network.forward_normalized(ref, obs, mask)
    err = float(jnp.mean(jnp.abs(v_scan - v_ref)))
    assert err < 0.05, err


def test_dispatch_watchdog():
    """Watchdog fires its action on timeout and stays silent otherwise."""
    import time

    from alphazero_tpu.utils import watchdog as WD

    fired = []
    with WD.DispatchWatchdog(0.05, "t", action=lambda: fired.append(1)):
        time.sleep(0.15)
    assert fired == [1]
    fired.clear()
    with WD.DispatchWatchdog(5.0, "t", action=lambda: fired.append(1)):
        pass
    time.sleep(0.1)
    assert fired == []
    # None disables the timer entirely
    with WD.DispatchWatchdog(None, "t", action=lambda: fired.append(1)):
        pass
    assert fired == []
    assert WD.first_call_timeout(None) is None
    assert WD.first_call_timeout(900.0) == 3600.0


def test_player_spec_coverage():
    """Every stock player spec (``src/benchmark.jl:126-194`` +
    ``EpsilonGreedyPlayer``/``PlayerWithTemperature``, ``src/play.jl``)
    produces a valid batched think distribution."""
    from alphazero_tpu import arena as A
    from alphazero_tpu.config import MctsParams
    from alphazero_tpu.envs import registry
    from alphazero_tpu.models import SimpleNetSpec
    from alphazero_tpu.models.interface import Network

    game = registry()["tictactoe"]
    spec = SimpleNetSpec(width=16, depth_common=1)
    net = Network(game, spec).init(jax.random.key(0))
    mp = MctsParams(num_iters_per_turn=8)
    states = game.init_batch(4, jax.random.key(1))
    mask = np.asarray(jax.vmap(game.legal_mask)(states))
    players = [
        A.Full(mp),
        A.NetworkOnly(tau=0.5),          # PlayerWithTemperature role
        A.MctsRollouts(mp),
        A.MinMaxTS(depth=2, tau=0.2),
        A.RandomPlayerSpec(),
        A.EpsilonGreedy(A.NetworkOnly(), eps=0.3),
    ]
    for p in players:
        think, uses_net = p.make_think(game, spec)
        pi = np.asarray(jax.jit(think)(net, states, 0, jax.random.key(2)))
        assert pi.shape == (4, game.num_actions), type(p).__name__
        np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-4,
                                   err_msg=type(p).__name__)
        assert (pi[~mask] < 1e-6).all(), type(p).__name__
    # epsilon-greedy actually mixes toward uniform
    base, _ = A.NetworkOnly(tau=0.0).make_think(game, spec)
    mixed, _ = A.EpsilonGreedy(A.NetworkOnly(tau=0.0),
                               eps=1.0).make_think(game, spec)
    pm = np.asarray(mixed(net, states, 0, jax.random.key(3)))
    legal_counts = mask.sum(-1, keepdims=True)
    np.testing.assert_allclose(pm[mask], (1.0 / legal_counts
                                          * np.ones_like(pm))[mask],
                               atol=1e-5)


def test_rollout_duel_lane_guard():
    """The guard is keyed on the round-4 re-bisect's actual fault
    variable — the playout scan LENGTH inside the search program — plus a
    sims x lanes chunking budget at the validated (<=42-ply) envelope:
    c4 1000x256x42 runs on-chip while mancala 1000x32x120 crashes
    (NOTES.md round-4 re-bisect)."""
    import dataclasses
    import warnings as W

    from alphazero_tpu import arena as A
    from alphazero_tpu.config import MctsParams, SimParams
    from alphazero_tpu.envs import registry

    m = registry()["mancala"]
    c4 = registry()["connect-four"]
    full = A.Full(MctsParams(num_iters_per_turn=600))
    roll1000 = A.MctsRollouts(MctsParams(num_iters_per_turn=1000))
    roll1000_trunc = dataclasses.replace(
        roll1000, max_playout_plies=A.ROLLOUT_VALIDATED_PLIES)
    sim256 = SimParams(num_games=256, num_lanes=256)
    sim512 = SimParams(num_games=512, num_lanes=512)

    with W.catch_warnings():
        W.simplefilter("error")  # any warning -> failure
        # c4's 42-ply playouts are within the validated envelope: the
        # re-bisected 1000x256 shape passes through unchanged
        assert A.rollout_safe_sim(sim256, full, roll1000,
                                  game=c4).num_lanes == 256
        # ... but sims x lanes beyond the validated 256k budget chunks
        g = A.rollout_safe_sim(sim512, roll1000, roll1000, game=c4)
        assert g.num_lanes == 256 and g.num_rounds == 2
        # network-search programs are never touched
        assert A.rollout_safe_sim(sim512, full, full,
                                  game=m).num_lanes == 512
        assert A.rollout_safe_sim(sim512, full, None,
                                  game=c4).num_lanes == 512
        # truncated mancala playouts are inside the envelope: no warning
        assert A.rollout_safe_sim(sim256, full, roll1000_trunc,
                                  game=m).num_lanes == 256

    # untruncated mancala playouts (120-ply scan) warn: lane chunking
    # does not avoid this fault, truncation must be configured
    with pytest.warns(UserWarning, match="playout scan"):
        A.rollout_safe_sim(SimParams(num_games=128, num_lanes=128),
                           roll1000, game=m)


def test_flagship_init_value_head_is_decisive():
    """The iteration-1 takeoff depends on the init value head emitting a
    decisive (RMS ~0.3-0.6) per-state-consistent signal — the reference's
    measured init statistic (ui-first-iter.png; NOTES.md round 4).  Guard
    it: a silent return to a value-silent init (RMS ~0.09) would regress
    the whole learning trajectory without failing any semantics test."""
    import jax
    import numpy as np

    from alphazero_tpu import experiments
    from alphazero_tpu.models.interface import Network

    exp = experiments.registry()["connect-four"]
    assert exp.netspec.value_init_gain >= 2.0
    game = exp.game
    net = Network(game, exp.netspec)
    st = net.init(jax.random.key(3))
    s = game.init_batch(64, jax.random.key(0))
    # spread the batch: play 8 uniform-random moves
    for i in range(8):
        k = jax.random.fold_in(jax.random.key(1), i)
        mask = jax.vmap(game.legal_mask)(s)
        import jax.numpy as jnp
        a = jax.random.categorical(k, jnp.where(mask, 0.0, -1e9))
        done = jax.vmap(game.terminated)(s)
        s2 = jax.vmap(game.step)(s, a, jax.random.split(k, 64))
        s = jax.tree.map(lambda n_, o: jnp.where(
            done.reshape((-1,) + (1,) * (n_.ndim - 1)), o, n_), s2, s)
    obs = jax.vmap(game.observe)(s)
    mask = jax.vmap(game.legal_mask)(s)
    _, _, v, _ = net.forward_normalized(st, obs, mask)
    rms = float(np.sqrt((np.asarray(v) ** 2).mean()))
    assert 0.15 < rms < 1.0, rms
    # and deterministic per state (an oracle property the search relies on)
    _, _, v2, _ = net.forward_normalized(st, obs, mask)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
