"""Command-line interface.

Re-design of ``/root/reference/scripts/alphazero.jl`` +
``/root/reference/src/scripts/scripts.jl``: subcommands ``train``, ``play``,
``explore``, ``replot``, ``check-game``, ``dummy-run``, ``bench``.

    python -m alphazero_tpu.scripts.cli train connect-four
    python -m alphazero_tpu.scripts.cli train tictactoe --dummy
    python -m alphazero_tpu.scripts.cli play tictactoe
    python -m alphazero_tpu.scripts.cli explore connect-four
    python -m alphazero_tpu.scripts.cli check-game mancala
"""

from __future__ import annotations

import argparse
import sys


def _build_parser():
    p = argparse.ArgumentParser(
        prog="alphazero_tpu",
        description="TPU-native AlphaZero framework")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU JAX (default: use the TPU if present)")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, hlp in [
            ("train", "start or resume a training session"),
            ("play", "play interactively against the trained agent"),
            ("explore", "inspect the agent with the explorer REPL"),
            ("replot", "regenerate plots from session data"),
            ("check-game", "run game-interface conformance checks"),
            ("dummy-run", "smoke-test the full pipeline at minimum size"),
            ("bench", "run the self-play throughput benchmark")]:
        sp = sub.add_parser(name, help=hlp)
        if name != "bench":
            sp.add_argument("experiment", help="experiment/game name")
        sp.add_argument("--dir", default=None, help="session directory")
        if name == "train":
            sp.add_argument("--dummy", action="store_true",
                            help="shrink all parameters to minimum")
            sp.add_argument("--seed", type=int, default=0)
            sp.add_argument("--save-intermediate", action="store_true")
            sp.add_argument("--iters", type=int, default=0,
                            help="override Params.num_iters")
            sp.add_argument("--benchmark-every", type=int, default=1,
                            help="benchmark cadence in iterations")
        if name == "play":
            sp.add_argument(
                "--players", default=None, metavar="WHITE,BLACK",
                help="pair of 'human'/'agent' (default: human,agent); "
                     "'human,human' needs no trained session — any "
                     "pairing, like the reference's GI.interactive!")
        if name in ("train", "dummy-run"):
            sp.add_argument(
                "--mesh", type=int, default=0, metavar="N",
                help="run SPMD over an N-device mesh (0 = single device; "
                     "-1 = all visible devices)")
            sp.add_argument(
                "--distributed", default=None, metavar="SPEC",
                help="join a multi-host runtime first: 'auto' (TPU pods) or "
                     "'coordinator_host:port,num_processes,process_id'; "
                     "run the same command on every host")
    return p


def main(argv=None):
    args = _build_parser().parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    mesh = None
    if getattr(args, "distributed", None) is not None:
        from ..parallel import distributed as dist
        dist.initialize(**dist.parse_spec(args.distributed))
        if not getattr(args, "mesh", 0):
            args.mesh = -1  # multi-host implies a global mesh
    if getattr(args, "mesh", 0):
        from ..parallel import make_mesh
        n = args.mesh if args.mesh > 0 else len(jax.devices())
        mesh = make_mesh(n)

    if args.cmd == "bench":
        import bench
        bench.main()
        return

    from .. import experiments
    reg = experiments.registry()
    if args.experiment not in reg:
        sys.exit(f"unknown experiment '{args.experiment}' "
                 f"(available: {', '.join(reg)})")
    exp = reg[args.experiment]

    if args.cmd == "check-game":
        from . import test_game
        test_game.check_game(exp.game)
        print(f"{exp.game.name}: all interface checks passed")
        return

    if args.cmd in ("dummy-run",) or (args.cmd == "train" and
                                      getattr(args, "dummy", False)):
        exp = experiments.dummy_run_experiment(exp)

    from ..session import Session

    if args.cmd in ("train", "dummy-run"):
        if getattr(args, "iters", 0):
            import dataclasses
            exp = dataclasses.replace(
                exp, params=dataclasses.replace(
                    exp.params, num_iters=args.iters))
        session = Session(exp, dir=args.dir,
                          seed=getattr(args, "seed", 0),
                          save_intermediate=getattr(
                              args, "save_intermediate", False),
                          benchmark_every=getattr(
                              args, "benchmark_every", 1),
                          mesh=mesh)
        session.resume()
    elif args.cmd == "replot":
        from ..session.plots import (plot_benchmark, plot_iteration,
                                     plot_training)
        import os
        d = args.dir or os.path.join("sessions", exp.name)
        rdir = os.path.join(d, "reports")
        if os.path.isdir(rdir):
            for fn in os.listdir(rdir):
                plot_iteration(d, int(fn.split("_")[1].split(".")[0]))
        plot_training(d)
        plot_benchmark(d)
        print(f"plots regenerated under {d}/plots")
    elif args.cmd in ("play", "explore"):
        players = None
        if args.cmd == "play" and args.players:
            players = tuple(args.players.split(","))
            if (len(players) != 2
                    or any(p not in ("human", "agent") for p in players)):
                raise SystemExit(
                    f"--players must be two of human/agent, got "
                    f"{args.players}")
        if players == ("human", "human"):
            # no trained session needed for two humans
            from ..session.explorer import interactive_play
            interactive_play(exp.game, players=players)
            return
        session = Session(exp, dir=args.dir, quiet=True)
        env = session.env
        if args.cmd == "play":
            from ..session.explorer import interactive_play
            mp = (env.params.arena.mcts if env.params.arena
                  else env.params.self_play.mcts)
            interactive_play(exp.game, exp.netspec, env.bestnn, mp,
                             players=players)
        else:
            from ..session.explorer import Explorer
            mp = (env.params.arena.mcts if env.params.arena
                  else env.params.self_play.mcts)
            Explorer(exp.game, exp.netspec, env.bestnn, mp,
                     replay=env.replay).repl()


if __name__ == "__main__":
    main()
