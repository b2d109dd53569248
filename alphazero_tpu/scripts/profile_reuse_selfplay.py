"""Throughput probe: flagship self-play WITH cross-move tree reuse.

Sizes the reuse-enabled flagship run (see NOTES.md round 3): carried trees
roughly double the search slab capacity (reuse_cap + num_sims) and deepen
descents (the reference's exploration depth grows 4.4 -> ~9 once its
persistent tree warms up, ``docs c4-plots exploration_depth.png``), so the
per-sim cost is expected well above the fresh-tree 1027-samples/s headline.

Usage: python -m alphazero_tpu.scripts.profile_reuse_selfplay
         [--lanes 1024] [--sims 600] [--cap 600] [--moves 24] [--fresh]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--cap", type=int, default=600)
    ap.add_argument("--moves", type=int, default=24)
    ap.add_argument("--max-depth", type=int, default=0,
                    help="0 = uncapped (reference semantics)")
    ap.add_argument("--gather", default=None, choices=[None, "take", "onehot"])
    ap.add_argument("--stages", type=int, default=0)
    ap.add_argument("--fresh", action="store_true",
                    help="baseline: fresh trees (reuse off)")
    ap.add_argument("--net", default=None,
                    help="load a trained net (bestnn.npz) — the target-"
                         "sharpness comparison only means something with "
                         "a non-random oracle")
    args = ap.parse_args(argv)

    from ..config import MctsParams
    from ..envs import registry
    from ..models import ResNetSpec
    from ..training import _selfplay_program
    from ..models.interface import Network
    from ..utils.schedules import PLSchedule

    game = registry()["connect-four"]
    spec = ResNetSpec(num_filters=128, num_blocks=5,
                      num_policy_head_filters=32, num_value_head_filters=32,
                      batch_norm_momentum=0.1)
    net = Network(game, spec.inference_spec()).init(jax.random.key(0))
    if args.net:
        from ..session.session import load_pytree
        net = load_pytree(args.net, net)
    p = MctsParams(
        num_iters_per_turn=args.sims, cpuct=2.0, prior_temperature=1.0,
        temperature=PLSchedule([0, 20, 30], [1.0, 1.0, 0.3]),
        dirichlet_noise_eps=0.25, dirichlet_noise_alpha=1.0,
        max_depth=args.max_depth or None,
        gather=args.gather, stages=args.stages or None,
        reuse_tree=not args.fresh, reuse_cap=args.cap)
    run = _selfplay_program(game, spec, p, args.lanes, 0.0, None)

    t0 = time.perf_counter()
    tb = run(net, jax.random.key(1))
    n = int(jax.jit(lambda x: x.sum())(tb.num_moves))
    t1 = time.perf_counter()
    depth = float(tb.nodes_traversed) / max(float(tb.num_sims), 1)
    print(f"first call (compile+run): {t1 - t0:.1f}s "
          f"samples={n} depth={depth:.2f}")
    t0 = time.perf_counter()
    tb = run(net, jax.random.key(2))
    n = int(jax.jit(lambda x: x.sum())(tb.num_moves))
    t1 = time.perf_counter()
    depth = float(tb.nodes_traversed) / max(float(tb.num_sims), 1)

    @jax.jit
    def pi_entropy(pi, valid):
        h = -jnp.sum(pi * jnp.log(pi + 1e-12), axis=-1)
        w = valid.astype(jnp.float32)
        return jnp.sum(h * w) / jnp.maximum(jnp.sum(w), 1.0)

    hp = float(pi_entropy(tb.pi, tb.valid))

    # data-sanity probe: fraction of valid consecutive transitions whose
    # board did NOT change (a dropped/no-op move — must be ~0)
    import numpy as np
    B = args.lanes
    L = tb.pi.shape[0] // B
    boards = np.asarray(tb.states.board).reshape(B, L, 6, 7)
    valid = np.asarray(tb.valid).reshape(B, L)
    both = valid[:, 1:] & valid[:, :-1]
    same = (boards[:, 1:] == boards[:, :-1]).all(axis=(2, 3)) & both
    noop = same.sum() / max(both.sum(), 1)
    lens = np.asarray(tb.num_moves)
    print(f"steady: {n / (t1 - t0):.1f} samples/s "
          f"({n} samples in {t1 - t0:.1f}s, avg depth {depth:.2f}, "
          f"pi-entropy {hp:.3f}, noop-rate {100 * noop:.2f}%, "
          f"len mean {lens.mean():.1f} max {lens.max()}, "
          f"reuse={'off' if args.fresh else args.cap})")


if __name__ == "__main__":
    main()
