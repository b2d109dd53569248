"""Self-play weak-scaling benchmark over a device mesh.

Measures the BASELINE.json scaling metric — self-play env-steps/s at
growing mesh sizes with a fixed per-device lane count — and reports
parallel efficiency relative to the single-device run.  The reference has
no equivalent: its multi-machine fan-out (``Distributed.@spawnat``,
``/root/reference/src/simulations.jl:252-290``) was never benchmarked for
scaling efficiency.

On the single-chip dev box this runs on a virtual CPU mesh
(``--platform cpu --devices 8`` forces ``xla_force_host_platform_device_
count``), which validates the SPMD program structure and measures the
XLA-partitioned program's overhead, not real ICI scaling; on a pod slice
the same script measures the real thing.

Usage:
    python -m alphazero_tpu.scripts.scaling [--lanes-per-device 256]
        [--sims 64] [--platform cpu|tpu] [--devices 8] [--net]
        [--production] [--fixed-work]

``--production`` measures the SESSION's own self-play phase
(``training.self_play_step``: segmented dispatches + sharded replay push)
instead of the raw fused batch — the number that matters for training.
``--fixed-work`` holds the TOTAL lane count constant while growing the mesh
(strong-scaling/partition-overhead view): on a virtual CPU mesh, where every
"device" shares the same physical cores, weak-scaling throughput cannot
exceed the core count, so the honest SPMD-structure metric is that the
partitioned program costs no more than the unpartitioned one.
"""

from __future__ import annotations

import argparse
import functools
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes-per-device", type=int, default=256)
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=0,
                    help="with --platform cpu: virtual device count")
    ap.add_argument("--net", action="store_true",
                    help="use a randomly initialized flagship ResNet oracle "
                         "instead of the uniform-prior oracle")
    ap.add_argument("--production", action="store_true",
                    help="measure training.self_play_step (the real "
                         "session phase) instead of the raw fused batch")
    ap.add_argument("--fixed-work", action="store_true",
                    help="hold total lanes constant across mesh sizes")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="append results as one JSON object to this file "
                         "(the committed scaling artifact)")
    args = ap.parse_args(argv)

    if args.platform == "cpu" and args.devices:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from .. import parallel
    from ..arena import mcts_config
    from ..config import MctsParams
    from ..envs import registry
    from ..models import ResNetSpec
    from ..models.interface import Network
    from ..search import mcts as M
    from ..selfplay import self_play_batch
    from ..utils.schedules import ConstSchedule

    game = registry()["connect-four"]
    cfg = mcts_config(MctsParams(num_iters_per_turn=args.sims))
    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    if sizes[-1] != ndev:
        sizes.append(ndev)

    if args.net:
        spec = ResNetSpec(num_filters=128, num_blocks=5,
                          num_policy_head_filters=32,
                          num_value_head_filters=32,
                          batch_norm_momentum=0.1).inference_spec()
        network = Network(game, spec)
        net = network.init(jax.random.key(0))
    else:
        net = None

    def finish(results):
        if args.out:
            import json
            base = results[sizes[0]]
            eff = {n: (r / base if args.fixed_work
                       else r / (base * n / sizes[0]))
                   for n, r in results.items()}
            rec = dict(
                mode="production" if args.production else "raw",
                platform=jax.default_backend(),
                device_kind=str(jax.devices()[0].device_kind),
                devices=sizes, lanes_per_device=args.lanes_per_device,
                sims=args.sims, fixed_work=bool(args.fixed_work),
                net=bool(args.net),
                samples_per_s={str(n): r for n, r in results.items()},
                efficiency={str(n): e for n, e in eff.items()})
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"appended -> {args.out}")
        return results

    if args.production:
        return finish(_production(args, sizes))

    results = {}
    for n in sizes:
        mesh = parallel.make_mesh(n)
        B = (args.lanes_per_device * sizes[-1] if args.fixed_work
             else args.lanes_per_device * n)

        def oracle(states, obs, mask):
            obs = parallel.shard_lanes(mesh, obs)
            if net is None:
                p = mask.astype(jnp.float32)
                p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
                return p, jnp.zeros(p.shape[:1], jnp.float32)
            p, _, v, _ = network.forward_normalized(net, obs, mask)
            return p, v

        @functools.partial(
            jax.jit,
            out_shardings=parallel.replicated(mesh))
        def run(key):
            tb = self_play_batch(game, oracle, cfg, ConstSchedule(1.0),
                                 B, key)
            return tb.num_moves.sum(), tb.num_sims

        run(jax.random.key(0))  # compile
        best = float("inf")
        moves = sims = 0
        for r in range(args.reps):
            t0 = time.perf_counter()
            m, s = jax.block_until_ready(run(jax.random.key(r + 1)))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            moves, sims = int(m), int(s)
        sps = moves / best
        results[n] = sps
        if args.fixed_work:
            eff = sps / results[sizes[0]]
            label = "fixed-work eff (t1/tN)"
        else:
            eff = sps / (results[sizes[0]] * n / sizes[0])
            label = "weak-scaling eff"
        print(f"devices={n:3d} lanes={B:6d}: {sps:10.1f} samples/s "
              f"({sims / best:12.1f} sims/s)  {label} "
              f"{100 * eff:5.1f}%")

    return finish(results)


def _production(args, sizes):
    """Scale the SESSION self-play phase: ``training.self_play_step`` with
    a mesh-sharded ``AZEnv`` — segmented dispatches, watchdog, sharded
    replay push, exactly the path ``cli train --mesh`` runs."""
    import dataclasses

    import jax

    from .. import experiments, parallel, training

    exp = experiments.registry()["connect-four"]
    base = exp.params

    results = {}
    for n in sizes:
        mesh = parallel.make_mesh(n) if n > 1 else None
        B = (args.lanes_per_device * sizes[-1] if args.fixed_work
             else args.lanes_per_device * n)
        sp = dataclasses.replace(
            base.self_play,
            mcts=base.self_play.mcts.replace(
                num_iters_per_turn=args.sims),
            sim=base.self_play.sim.replace(num_games=B, num_lanes=B))
        netspec = exp.netspec if args.net else exp.netspec.__class__(
            num_filters=16, num_blocks=1)
        params = dataclasses.replace(
            base, self_play=sp, arena=None,
            mem_buffer_size=base.mem_buffer_size)
        env = training.AZEnv.create(exp.game, netspec, params, seed=0,
                                    mesh=mesh)
        handlers = training.Handlers()
        training.self_play_step(env, handlers)  # warm-up + compile
        best = None
        for r in range(args.reps):
            t0 = time.perf_counter()
            rep = training.self_play_step(env, handlers)
            dt = time.perf_counter() - t0
            sps = rep.samples_gen_speed
            best = max(best or 0.0, sps)
        results[n] = best
        if args.fixed_work:
            eff = best / results[sizes[0]]
            label = "fixed-work eff (t1/tN)"
        else:
            eff = best / (results[sizes[0]] * n / sizes[0])
            label = "weak-scaling eff"
        print(f"devices={n:3d} lanes={B:6d}: {best:10.1f} samples/s "
              f"(production self_play_step)  {label} {100 * eff:5.1f}%")
    return results


if __name__ == "__main__":
    main()
