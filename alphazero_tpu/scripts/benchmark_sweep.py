"""Post-hoc benchmark sweep over saved per-iteration snapshots.

The reference benchmarks every iteration inline (``session.jl:529-533``) and
can re-run new benchmarks over saved iterations (``session.jl:549-570``).
Here evaluation compute is decoupled from training wall-clock: train with
``--save-intermediate`` (and a sparse ``--benchmark-every``), then sweep the
snapshots afterwards to produce the same won-games-vs-iteration curves
(``c4-plots benchmark_won_games.png``).

Results land in ``<dir>/benchmarks/iter_<n>.json`` — the same files the
inline cadence writes — so ``session/plots.py``'s benchmark plots pick them
up unchanged.

Usage:
    python -m alphazero_tpu.scripts.benchmark_sweep sessions/c4-reuse \
        [--games 256] [--duels az-mcts,net-mcts] [--stride 1]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


DUEL_KEYS = {
    "az-mcts": 0,    # AlphaZero vs MctsRollouts(1000)
    "az-minmax": 1,  # AlphaZero vs MinMax-5
    "net-mcts": 2,   # NetworkOnly vs MctsRollouts(1000)
    "net-minmax": 3, # NetworkOnly vs MinMax-5
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--exp", default="connect-four",
                    help="experiment whose benchmark set to sweep "
                         "(registry name; its params must match the "
                         "session's netspec)")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--duels", default="az-mcts,net-mcts",
                    help=f"subset of {sorted(DUEL_KEYS)} (default: the two "
                         "the reference's benchmark actually enables, "
                         "games/connect-four/params.jl:101-106)")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--skip-existing", action="store_true", default=True)
    ap.add_argument("--force", dest="skip_existing", action="store_false")
    args = ap.parse_args(argv)

    import jax

    from .. import arena as A
    from .. import experiments
    from .. import report as R
    from ..session.session import load_eval_net
    from ..utils import canary as canarymod

    canary = canarymod.summary(canarymod.validate_chip())
    print(f"canary: {canary}")
    exp = experiments.registry()[args.exp]
    duels = []
    for k in args.duels.split(","):
        if k not in DUEL_KEYS:
            raise SystemExit(f"unknown duel '{k}' (have {sorted(DUEL_KEYS)})")
        b = exp.benchmark[DUEL_KEYS[k]]
        duels.append(dataclasses.replace(
            b, sim=b.sim.replace(num_games=args.games)))

    iters = sorted(
        int(d.split("_")[1]) for d in os.listdir(args.dir)
        if d.startswith("iter_") and
        os.path.isdir(os.path.join(args.dir, d)))
    if not iters:
        raise SystemExit(f"no iter_* snapshots in {args.dir} "
                         "(train with --save-intermediate)")
    iters = [i for i in iters if i % args.stride == 0 or i == iters[-1]]
    print(f"sweeping iterations {iters} with {len(duels)} duels x "
          f"{args.games} games")
    os.makedirs(os.path.join(args.dir, "benchmarks"), exist_ok=True)
    for itc in iters:
        out_path = os.path.join(args.dir, "benchmarks", f"iter_{itc}.json")
        if args.skip_existing and os.path.exists(out_path):
            with open(out_path) as f:
                have = {e["legend"] for e in json.load(f)["evaluations"]}
        else:
            have = set()
        # eval-only load: fails loudly on incomplete snapshot dirs instead
        # of silently benchmarking a fresh random net (ADVICE r3, medium)
        snap = load_eval_net(exp, os.path.join(args.dir, f"iter_{itc}"))
        evals = []
        if have and os.path.exists(out_path):
            with open(out_path) as f:
                evals = json.load(f)["evaluations"]
        for d_i, item in enumerate(duels):
            legend = (f"{A.player_name(item.player)} vs "
                      f"{A.player_name(item.baseline)}")
            if legend in have:
                continue
            ev = A.run_benchmark_item(
                snap.game, snap.netspec, snap.bestnn, item,
                jax.random.key(1000 * itc + d_i),
                gamma=exp.params.self_play.mcts.gamma)
            w, d, l = A.ternary_stats(ev.rewards)
            print(f"  iter {itc}: {ev.legend}: avgr {ev.avgr:+.3f} "
                  f"({w}/{d}/{l} of {len(ev.rewards)}) [{ev.time:.0f}s]",
                  flush=True)
            evals.append(R.to_dict(ev))
        with open(out_path, "w") as f:
            json.dump({"iteration": itc, "canary": canary,
                       "evaluations": evals}, f, indent=2)
    # regenerate the benchmark curve plot from the files just written
    try:
        from ..session.plots import plot_benchmark
        plot_benchmark(args.dir)
        print(f"plots -> {args.dir}/plots")
    except Exception as exc:
        print(f"(plotting failed: {exc})")


if __name__ == "__main__":
    main()
