"""Session layer: checkpoint/resume round-trips, config JSON, reports."""

import json
import os

import jax
import numpy as np
import pytest

from alphazero_tpu import config as cfgmod
from alphazero_tpu import experiments
from alphazero_tpu.session import Session


def test_params_json_roundtrip():
    exp = experiments.registry()["connect-four"]
    text = cfgmod.params_to_json(exp.params)
    back = cfgmod.params_from_json(text)
    assert cfgmod.params_to_json(back) == text
    d = json.loads(text)
    assert d["self_play"]["mcts"]["num_iters_per_turn"] == 600
    assert d["learning"]["optimiser"]["type"] == "Adam"


def test_netspec_json_roundtrip():
    from alphazero_tpu.models import NetworkSpec
    for name in ("tictactoe", "connect-four"):
        spec = experiments.registry()[name].netspec
        assert NetworkSpec.from_json(spec.to_json()) == spec


def test_session_save_resume(tmp_path):
    exp = experiments.dummy_run_experiment(
        experiments.registry()["tictactoe"])
    d = str(tmp_path / "sess")
    s1 = Session(exp, dir=d, quiet=True, seed=0)
    s1.resume()
    assert s1.env.itc == 2
    rew_after = np.asarray(s1.env.replay.z)
    # resume from disk: state fully restored
    s2 = Session(exp, dir=d, quiet=True)
    assert s2.env.itc == 2
    np.testing.assert_array_equal(np.asarray(s2.env.replay.z), rew_after)
    for a, b in zip(jax.tree.leaves(s1.env.curnn.params),
                    jax.tree.leaves(s2.env.curnn.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training is complete; resume() must be a no-op that still works
    s2.resume()
    assert s2.env.itc == 2
    # artifacts on disk
    assert os.path.exists(os.path.join(d, "reports", "iter_1.json"))
    assert os.path.exists(os.path.join(d, "benchmarks", "iter_0.json"))
    assert os.path.exists(os.path.join(d, "log.txt"))
    # the reference's full plot-family set (``src/ui/plots.jl:20-253``)
    for f in ("loss.png", "entropies.png", "perf.png", "arena.png",
              "nsamples.png", "benchmark.png", "loss_last_batch.png",
              "loss_per_stage.png", "iter_summary/2.png",
              "iter_perfs/2.png", "iter_loss/2.png"):
        assert os.path.exists(os.path.join(d, "plots", f)), f


def test_session_rejects_changed_netspec(tmp_path):
    import dataclasses
    exp = experiments.dummy_run_experiment(
        experiments.registry()["tictactoe"])
    d = str(tmp_path / "sess")
    s1 = Session(exp, dir=d, quiet=True)
    s1.save()
    changed = dataclasses.replace(
        exp, netspec=dataclasses.replace(exp.netspec, width=123))
    with pytest.raises(ValueError, match="network"):
        Session(changed, dir=d, quiet=True)


def test_load_eval_net(tmp_path):
    """Eval-only snapshot loading (ADVICE r3): loads bestnn without mem.npz,
    and fails loudly — never falls back to fresh weights — when incomplete."""
    from alphazero_tpu.session.session import load_eval_net

    exp = experiments.dummy_run_experiment(
        experiments.registry()["tictactoe"])
    d = str(tmp_path / "sess")
    s1 = Session(exp, dir=d, quiet=True, seed=0)
    s1.resume()
    # a snapshot without the replay buffer must still load for evaluation
    os.remove(os.path.join(d, "mem.npz"))
    snap = load_eval_net(exp, d)
    assert snap.iteration == 2
    for a, b in zip(jax.tree.leaves(snap.bestnn.params),
                    jax.tree.leaves(s1.env.bestnn.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing network file -> loud failure, not a silent fresh env
    os.remove(os.path.join(d, "bestnn.npz"))
    with pytest.raises(FileNotFoundError):
        load_eval_net(exp, d)
    with pytest.raises(FileNotFoundError):
        load_eval_net(exp, str(tmp_path / "nope"))
