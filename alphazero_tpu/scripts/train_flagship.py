"""Flagship connect-four training run on the TPU chip.

Drives the reference's full recipe (``games/connect-four/params.jl``: ResNet
5x128, 600-sim MCTS, 5000 games/iter, gating arena, 15 iterations) through
the Session layer, with a benchmark cadence knob so evaluation duels don't
dominate wall-clock on a single chip (the reference benchmarks every
iteration on a 6-core desktop where one iteration takes ~1 h; here an
iteration is ~10 min, so per-iteration 256-game duels would be ~half the
budget).

Usage:
    python -m alphazero_tpu.scripts.train_flagship [--dir sessions/c4-flagship]
        [--iters 15] [--benchmark-every 3] [--lanes 1024] [--games 5000]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="sessions/c4-flagship")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--benchmark-every", type=int, default=3)
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--games", type=int, default=5000)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--algorithm", choices=["puct", "gumbel"],
                    default="puct",
                    help="search algorithm for self-play AND the gating "
                         "arena (benchmark baselines stay the standard "
                         "PUCT/minmax protocol)")
    ap.add_argument("--arena-sims", type=int, default=None,
                    help="override arena simulation count (default: same "
                         "as --sims)")
    ap.add_argument("--reuse", type=int, default=0,
                    help="SELF-PLAY cross-move tree reuse cap (0 = fresh "
                         "trees; the reference persists its tree across "
                         "moves, src/mcts.jl:124-151 + reset_every — this "
                         "is the array equivalent).  Arena/benchmark "
                         "players always use fresh trees")
    ap.add_argument("--self-play-max-depth", type=int, default=16,
                    help="descent-depth cap for self-play search "
                         "(0 = uncapped reference semantics)")
    ap.add_argument("--gather", default=None, choices=[None, "take", "onehot"],
                    help="descent lookup formulation override (bit-"
                         "identical; perf only)")
    ap.add_argument("--benchmark-games", type=int, default=None)
    ap.add_argument("--save-intermediate", action="store_true",
                    help="snapshot the session after every iteration "
                         "(enables post-hoc benchmark/Pons sweeps)")
    ap.add_argument("--gumbel-considered", type=int, default=8,
                    help="sequential-halving root candidates; should be "
                         "close to the legal-action count (7 for c4)")
    ap.add_argument("--no-supervise", action="store_true",
                    help="run in-process without the restart supervisor")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--mesh", type=int, default=0,
                    help="SPMD over an N-device mesh (0 = single device; "
                         "-1 = all visible devices)")
    args = ap.parse_args(argv)

    if not args.no_supervise:
        # elastic recovery: the watchdog (utils/watchdog.py) exits with
        # EXIT_STUCK when a device dispatch hangs (e.g. TPU worker death);
        # every iteration is checkpointed, so restart + resume loses at
        # most one iteration of work
        import subprocess
        import sys

        from ..utils.watchdog import EXIT_STUCK
        child_args = (argv if argv is not None
                      else sys.argv[1:]) + ["--no-supervise"]
        for attempt in range(args.max_restarts + 1):
            code = subprocess.call(
                [sys.executable, "-m",
                 "alphazero_tpu.scripts.train_flagship"] + list(child_args))
            if code == 0:
                return
            kind = "stuck dispatch" if code == EXIT_STUCK else f"crash ({code})"
            print(f"supervisor: child died [{kind}], "
                  f"restart {attempt + 1}/{args.max_restarts}", flush=True)
        raise SystemExit("supervisor: too many restarts")

    import dataclasses

    from ..experiments import connect_four
    from ..session import Session

    exp = connect_four.experiment(num_lanes=args.lanes)
    p = exp.params
    sp = p.self_play
    sp = dataclasses.replace(
        sp,
        sim=sp.sim.replace(num_games=args.games, num_lanes=args.lanes),
        mcts=sp.mcts.replace(num_iters_per_turn=args.sims,
                             algorithm=args.algorithm,
                             gumbel_max_considered=args.gumbel_considered,
                             reuse_tree=args.reuse > 0,
                             reuse_cap=args.reuse or 64,
                             max_depth=args.self_play_max_depth or None,
                             gather=args.gather))
    arena = dataclasses.replace(
        p.arena, mcts=p.arena.mcts.replace(
            num_iters_per_turn=args.arena_sims or args.sims,
            algorithm=args.algorithm,
            gumbel_max_considered=args.gumbel_considered))
    p = dataclasses.replace(p, self_play=sp, arena=arena,
                            num_iters=args.iters)
    if args.benchmark_games:
        bench = tuple(
            dataclasses.replace(
                b, sim=b.sim.replace(num_games=args.benchmark_games))
            for b in exp.benchmark)
        exp = dataclasses.replace(exp, benchmark=bench)
    exp = dataclasses.replace(exp, params=p)

    mesh = None
    if args.mesh:
        import jax

        from ..parallel import make_mesh
        mesh = make_mesh(args.mesh if args.mesh > 0
                         else len(jax.devices()))

    session = Session(exp, dir=args.dir, seed=args.seed,
                      benchmark_every=args.benchmark_every,
                      save_intermediate=args.save_intermediate, mesh=mesh)
    session.resume()


if __name__ == "__main__":
    main()
