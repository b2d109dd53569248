"""Large-sample final benchmark of a trained session's best network.

The per-iteration session benchmarks use the reference's 256-game protocol
(``games/connect-four/params.jl:94``); this re-runs the same duels with more
games for tighter confidence intervals on the headline claims, and prints
ternary win/draw/loss stats with a 95% CI on the win rate.

Usage:
    python -m alphazero_tpu.scripts.final_eval sessions/c4-flagship \
        [--games 512] [--lanes 128]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--games", type=int, default=512)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--out", default=None,
                    help="also write results as JSON to this path")
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import numpy as np

    from .. import arena as A
    from ..experiments import connect_four
    from ..session import Session
    from ..utils import canary as canarymod

    canary = canarymod.summary(canarymod.validate_chip())
    print(f"canary: {canary}")
    exp = connect_four.experiment()
    sess = Session(exp, dir=args.dir, autosave=False, quiet=True)
    env = sess.env
    assert not sess._fresh, f"no saved session in {args.dir}"
    print(f"Loaded {args.dir} at iteration {env.itc}")
    rng = jax.random.key(20260818)
    results = {}
    for item in exp.benchmark:
        sim = dataclasses.replace(item.sim, num_games=args.games,
                                  num_lanes=args.lanes)
        item = dataclasses.replace(item, sim=sim)
        rng, sub = jax.random.split(rng)
        ev = A.run_benchmark_item(env.game, env.netspec, env.bestnn, item,
                                  sub)
        r = np.asarray(ev.rewards)
        w, d, l = A.ternary_stats(r)
        n = len(r)
        p = w / n
        ci = 1.96 * np.sqrt(max(p * (1 - p), 1e-9) / n)
        print(f"{ev.legend}: avgr {r.mean():+.4f}  "
              f"won/draw/lost {w}/{d}/{l} of {n}  "
              f"win-rate {100*p:.1f}% ± {100*ci:.1f}%  ({ev.time:.0f}s)")
        results[ev.legend] = dict(
            avgr=float(r.mean()), won=w, draw=d, lost=l, games=n,
            win_rate=p, win_rate_ci95=float(ci))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"iteration": env.itc, "canary": canary,
                       "results": results}, f, indent=2)
        print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
