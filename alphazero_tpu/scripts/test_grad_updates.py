"""Memory canary: fill replay with random-play traces, run a learning phase.

Re-design of ``/root/reference/src/scripts/test_grad_updates.jl:9-18``: run
before a long training session to surface device-OOM early.

    python -m alphazero_tpu.scripts.test_grad_updates connect-four
"""

from __future__ import annotations

import sys

import jax


def run(name: str, num_lanes: int = 512) -> None:
    from .. import learning as learnmod
    from .. import memory as memmod
    from .. import selfplay as spmod
    from .. import training
    from ..experiments import registry
    from ..search import mcts
    from ..utils.schedules import ConstSchedule

    exp = registry()[name]
    env = training.AZEnv.create(exp.game, exp.netspec, exp.params, seed=0)
    cap = env.replay.capacity
    print(f"filling a {cap}-sample replay with random play...")
    oracle = mcts.random_oracle(exp.game)
    run_sp = jax.jit(lambda key: spmod.self_play_batch(
        exp.game, oracle, mcts.MCTSConfig(num_sims=2),
        ConstSchedule(1.0), num_lanes, key))
    rng = jax.random.key(0)
    while int(env.replay.size) < cap:
        rng, k = jax.random.split(rng)
        tb = run_sp(k)
        env.replay = memmod.push(env.replay, tb.states, tb.pi, tb.z, tb.t,
                                 tb.key, tb.valid)
        print(f"  {int(env.replay.size)}/{cap}")
    print("running a full learning phase at configured batch sizes...")
    trainer = learnmod.Trainer(
        exp.game, exp.netspec, env.curnn, env.replay, exp.params.learning,
        use_symmetries=exp.params.use_symmetries, rng=jax.random.key(1))
    n = trainer.batches_per_checkpoint()
    losses = trainer.batch_updates(min(n, 50))
    status = trainer.learning_status()
    print(f"ok: {len(losses)} updates, loss {losses[-1]:.4f}, "
          f"full-data L={status.loss.L:.4f} (no OOM)")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "connect-four")
