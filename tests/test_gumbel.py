"""Gumbel sequential-halving search (search/gumbel.py).

An opt-in extension over the reference's PUCT search; validated behaviorally:
schedule correctness, tactical soundness, visit budgeting, and
head-to-head strength at equal simulation budgets.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu import envs
from alphazero_tpu.envs import core
from alphazero_tpu.search import gumbel, mcts

TTT = envs.registry()["tictactoe"]
C4 = envs.registry()["connect-four"]


def test_considered_visit_schedule():
    # m=4, n=16 -> phase 1: 4 actions x2 rounds, phase 2: 2 actions x4 rounds
    seq = gumbel.considered_visit_schedule(4, 16)
    assert len(seq) == 16
    assert seq[:8] == (0, 0, 0, 0, 1, 1, 1, 1)
    # all entries are valid visit counts (non-negative, bounded by n)
    assert all(0 <= v < 16 for v in seq)
    # m=1 degenerates to a single line of play
    assert gumbel.considered_visit_schedule(1, 5) == (0, 1, 2, 3, 4)


def test_finds_winning_move():
    s = TTT.init_batch(1)
    for a in [0, 3, 1, 4]:  # X: 0,1  O: 3,4 -> X wins at 2
        s = jax.vmap(TTT.step)(s, jnp.array([a]),
                               jax.random.split(jax.random.key(0), 1))
    res = jax.jit(lambda r, k: gumbel.search(
        TTT, mcts.random_oracle(TTT), r, k,
        gumbel.GumbelConfig(num_sims=32, max_considered=8)))(
            s, jax.random.key(1))
    assert int(res.action[0]) == 2
    assert abs(float(res.policy.sum()) - 1.0) < 1e-5
    assert float(res.policy[0, 2]) > 0.5


def test_visit_budget_and_legality():
    B = 16
    roots = C4.init_batch(B)
    key = jax.random.key(3)
    for _ in range(4):  # scatter the roots
        key, k2, k3 = jax.random.split(key, 3)
        legal = jax.vmap(C4.legal_mask)(roots).astype(jnp.float32)
        a = jax.vmap(core.sample_from)(legal, jax.random.split(k2, B))
        roots = jax.vmap(C4.step)(roots, a, jax.random.split(k3, B))
    cfg = gumbel.GumbelConfig(num_sims=48, max_considered=16)
    res = jax.jit(lambda r, k: gumbel.search(
        C4, mcts.random_oracle(C4), r, k, cfg))(roots, jax.random.key(4))
    visits = np.asarray(res.root_visits)
    assert visits.sum(-1).tolist() == [48] * B  # one root visit per sim
    legal = np.asarray(jax.vmap(C4.legal_mask)(roots))
    acts = np.asarray(res.action)
    assert all(legal[b, acts[b]] for b in range(B))
    assert not np.any(np.asarray(res.policy)[~legal] > 1e-6)


def test_gumbel_not_weaker_than_puct_at_equal_budget():
    """30-sim Gumbel vs 30-sim PUCT (same random oracle) head-to-head on
    connect-four; the halving policy-improvement should not lose."""
    B = 32
    oracle = mcts.random_oracle(C4)
    gcfg = gumbel.GumbelConfig(num_sims=30, max_considered=8)
    pcfg = mcts.MCTSConfig(num_sims=30, cpuct=1.0)

    @jax.jit
    def play_match(key, gumbel_is_white):
        def body(states, k):
            k1, k3 = jax.random.split(k)
            done = jax.vmap(C4.terminated)(states)
            white_turn = jax.vmap(C4.to_play)(states) == core.WHITE
            gumbel_turn = white_turn == gumbel_is_white
            gres = gumbel.search(C4, oracle, states, k1, gcfg)
            pres = mcts.search(C4, oracle, states, k1, pcfg)
            a = jnp.where(gumbel_turn, gres.action,
                          jnp.argmax(pres.policy, -1).astype(jnp.int32))
            s2 = jax.vmap(C4.step)(states, a, jax.random.split(k3, B))
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, states)
            rew = jnp.where(done, 0.0, jax.vmap(C4.reward)(s2))
            return s2, rew

        _, rews = jax.lax.scan(body, C4.init_batch(B),
                               jax.random.split(key, 42))
        tw = rews.sum(0)
        return jnp.where(gumbel_is_white, tw, -tw)

    r = np.concatenate([np.asarray(play_match(jax.random.key(0), True)),
                        np.asarray(play_match(jax.random.key(1), False))])
    assert r.mean() > -0.05, f"gumbel lost to puct at equal budget: {r.mean()}"


def test_gumbel_pipeline_end_to_end(tmp_path):
    """Full session (self-play -> learn -> arena -> save) with
    ``algorithm="gumbel"`` in both self-play and arena params."""
    import dataclasses
    import os

    from alphazero_tpu import experiments
    from alphazero_tpu.session import Session

    exp = experiments.dummy_run_experiment(
        experiments.registry()["tictactoe"])
    p = exp.params
    p = dataclasses.replace(
        p,
        self_play=dataclasses.replace(
            p.self_play, mcts=p.self_play.mcts.replace(
                algorithm="gumbel", gumbel_max_considered=4)),
        arena=dataclasses.replace(
            p.arena, mcts=p.arena.mcts.replace(
                algorithm="gumbel", gumbel_max_considered=4)))
    exp = dataclasses.replace(exp, params=p)
    s = Session(exp, dir=str(tmp_path / "sess"), quiet=True, seed=0)
    s.resume()
    assert s.env.itc == 2
    assert int(s.env.replay.size) > 0
    assert os.path.exists(str(tmp_path / "sess" / "reports" / "iter_1.json"))
