"""Network inference microbenchmark.

Analogue of ``/root/reference/scripts/profile/inference.jl`` (which records
17-27 us/sample on an RTX 2070 at batch 128).

    python -m alphazero_tpu.scripts.profile_inference
"""

import time

import jax
import jax.numpy as jnp


def main():
    from ..envs import registry
    from ..models import ResNetSpec
    from ..models.interface import Network

    game = registry()["connect-four"]
    for filters in (64, 128):
        spec = ResNetSpec(num_filters=filters, num_blocks=5,
                          num_policy_head_filters=32,
                          num_value_head_filters=32,
                          compute_dtype="bfloat16")
        network = Network(game, spec)
        net = network.init(jax.random.key(0))
        for batch in (128, 1024, 4096):
            obs = jnp.zeros((batch,) + game.obs_shape, jnp.float32)
            mask = jnp.ones((batch, game.num_actions), bool)
            f = jax.jit(lambda n, o, m: network.forward_normalized(n, o, m)[0])
            jax.block_until_ready(f(net, obs, mask))
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(net, obs, mask)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / iters
            print(f"resnet-{filters:>3} batch={batch:<5} "
                  f"{dt*1e3:7.2f} ms/batch  {dt/batch*1e6:7.2f} us/sample")


if __name__ == "__main__":
    main()
