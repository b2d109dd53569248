"""Multi-controller (multi-process) Session smoke — one worker process.

The reference really executes multi-machine self-play by shipping closures
to worker processes (``/root/reference/src/simulations.jl:252-290``).  The
TPU-native equivalent is multi-controller SPMD: every process runs this SAME
script, ``jax.distributed.initialize`` joins them into one runtime, and the
production ``Session`` loop runs unchanged over a global mesh spanning every
process's devices (``parallel/distributed.py``).

This script is both the pod-launch recipe (run it once per host with real
TPU devices and ``--devices-per-proc`` omitted) and the CI harness's worker
(tests/test_multiprocess.py launches two of these on CPU with 4 virtual
devices each and asserts seed parity against a 1-process run).

Standalone usage (run BOTH, e.g. in two shells)::

    python -m alphazero_tpu.scripts.multiproc_smoke \
        --coord localhost:9373 --nprocs 2 --pid 0 --dir /tmp/mp-smoke
    python -m alphazero_tpu.scripts.multiproc_smoke \
        --coord localhost:9373 --nprocs 2 --pid 1 --dir /tmp/mp-smoke
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", default=None,
                    help="coordinator host:port (omit on TPU pods, where "
                         "the topology is auto-discovered)")
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--dir", required=True,
                    help="shared session directory (shared filesystem)")
    ap.add_argument("--devices-per-proc", type=int, default=0,
                    help="force N virtual CPU devices in this process "
                         "(0 = use the real platform)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--crash-in-iter", type=int, default=0,
                    help="simulate a crash: hard-exit (os._exit 17) every "
                         "process mid-iteration N (after self-play, before "
                         "learning), leaving the iteration-(N-1) checkpoint "
                         "as the recovery point — the fault-tolerance drill "
                         "(0 = run to completion)")
    args = ap.parse_args(argv)

    if args.devices_per_proc:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices_per_proc}")

    import jax

    if args.devices_per_proc:
        # the axon TPU plugin force-prepends itself to JAX_PLATFORMS; the
        # config update is the reliable way to pin the CPU backend
        jax.config.update("jax_platforms", "cpu")

    from ..parallel import distributed

    if args.coord is not None:
        distributed.initialize(args.coord, args.nprocs, args.pid)
        assert jax.process_count() == args.nprocs, (
            f"runtime has {jax.process_count()} processes, "
            f"expected {args.nprocs} — distributed.initialize did not take")
    nproc = jax.process_count()
    pid = jax.process_index()
    print(f"[proc {pid}] joined runtime: {nproc} processes, "
          f"{jax.device_count()} global devices "
          f"({jax.local_device_count()} local)", flush=True)

    import jax.numpy as jnp
    import numpy as np

    from .. import experiments
    from ..session import Session

    exp = experiments.mesh_smoke_experiment()
    mesh = distributed.global_mesh()

    if args.crash_in_iter:
        # every process hard-exits at the same deterministic point (between
        # self-play and learning of iteration N), so no process is left
        # hanging on a collective.  Recovery = restart all processes and
        # resume from the iteration-(N-1) checkpoint — the same
        # restart-and-resume story as the reference
        # (``src/ui/session.jl:110-118,310-321``), exercised for real.
        class CrashingSession(Session):
            def learning_started(self, env):
                super().learning_started(env)
                if env.itc == args.crash_in_iter - 1:
                    print(f"[proc {pid}] simulated crash mid-iteration "
                          f"{args.crash_in_iter}", flush=True)
                    os._exit(17)

        session_cls = CrashingSession
    else:
        session_cls = Session
    session = session_cls(exp, dir=args.dir, quiet=pid != 0, seed=args.seed,
                          mesh=mesh)
    session.resume()

    # process-independent fingerprint of the final network (params are
    # replicated, so every process computes the same value)
    digest = float(sum(
        float(jax.jit(lambda l: jnp.sum(jnp.abs(l.astype(jnp.float32))))(l))
        for l in jax.tree.leaves(session.env.curnn.params)))
    replay_z = float(jax.jit(lambda z: jnp.sum(z))(session.env.replay.z))
    out = {"pid": pid, "nprocs": nproc, "digest": digest,
           "replay_z_sum": replay_z,
           "replay_size": int(session.env.replay.size),
           "iteration": session.env.itc}
    with open(os.path.join(args.dir, f"proc_{pid}_result.json"), "w") as f:
        json.dump(out, f)
    print(f"[proc {pid}] done: {out}", flush=True)


if __name__ == "__main__":
    main()
