"""MCTS microbenchmark: per-simulation cost vs tree size and batch width.

The analogue of ``/root/reference/scripts/profile/mcts.jl`` (which records
3-11 us/sim on CPU).  Run on the TPU chip:

    python -m alphazero_tpu.scripts.profile_mcts
"""

import time

import jax
import jax.numpy as jnp


def main():
    from ..envs import registry
    from ..envs import core as envcore
    from ..models import ResNetSpec
    from ..models.interface import Network
    from ..search import mcts

    game = registry()["connect-four"]
    spec = ResNetSpec(num_filters=128, num_blocks=5,
                      num_policy_head_filters=32, num_value_head_filters=32,
                      compute_dtype="bfloat16")
    network = Network(game, spec)
    net = network.init(jax.random.key(0))

    def net_oracle(states, obs, mask):
        p, _, v, _ = network.forward_normalized(net, obs, mask)
        return p, v

    uni_oracle = mcts.random_oracle(game)

    def run_one(B, sims, oracle, label):
        cfg = mcts.MCTSConfig(num_sims=sims, cpuct=2.0)
        s0 = game.init_batch(B)

        @jax.jit
        def search(s, key):
            return mcts.search(game, oracle, s, key, cfg).root_visits

        t0 = time.perf_counter()
        jax.block_until_ready(search(s0, jax.random.key(0)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(search(s0, jax.random.key(1)))
        run_s = time.perf_counter() - t0
        per_sim_ms = run_s / sims * 1e3
        print(f"{label:>10}  B={B:<5} sims={sims:<4} "
              f"compile={compile_s:6.1f}s run={run_s:6.2f}s "
              f"per-sim={per_sim_ms:7.3f}ms per-sim-per-lane="
              f"{per_sim_ms / B * 1e3:8.3f}us")

    for B, sims in [(256, 100), (256, 300), (256, 600),
                    (1024, 100), (1024, 600)]:
        run_one(B, sims, uni_oracle, "uniform")
    for B, sims in [(1024, 100), (1024, 600)]:
        run_one(B, sims, net_oracle, "resnet")


if __name__ == "__main__":
    main()
