"""Bisect the 256-lane Full-vs-MctsRollouts TPU worker crash (NOTES.md).

The flagship benchmark duel program reproducibly kills the TPU worker at
256 lanes while 128 lanes (and the 1024-lane pure-self-play bench) are
stable.  This script isolates which program component trips it by running
each candidate in sequence at a given lane count; run it once per variant
from a SHELL LOOP (a worker crash kills the process, so in-process
bisection would stop at the first crash):

    for v in rollout_only full_only combined combined_nofused; do
      timeout 1200 python -m alphazero_tpu.scripts.repro_duel256 \
          --variant $v --lanes 256 || echo "CRASH: $v"
    done

Variants:
  rollout_only      MctsRollouts(1000) self-duel (rollout-oracle search)
  full_only         Full(600) self-duel (network search; bench-like)
  combined          Full(600) vs MctsRollouts(1000) (the crashing program)
  combined_short    Full(600) vs MctsRollouts(100) (smaller rollout tree)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["rollout_only", "full_only", "combined",
                             "combined_short"])
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--rollout-sims", type=int, default=1000)
    args = ap.parse_args(argv)

    import jax

    from .. import arena as A
    from ..config import MctsParams, SimParams
    from ..experiments import connect_four
    from ..models.interface import Network

    exp = connect_four.experiment()
    game = exp.game
    net = Network(game, exp.netspec).init(jax.random.key(0))
    full = A.Full(exp.params.arena.mcts.replace(
        num_iters_per_turn=args.sims))
    rollouts = A.MctsRollouts(exp.params.arena.mcts.replace(
        num_iters_per_turn=args.rollout_sims, cpuct=1.0))
    short = A.MctsRollouts(exp.params.arena.mcts.replace(
        num_iters_per_turn=100, cpuct=1.0))
    pairs = {
        "rollout_only": (rollouts, rollouts),
        "full_only": (full, full),
        "combined": (full, rollouts),
        "combined_short": (full, short),
    }
    a, b = pairs[args.variant]
    sim = SimParams(num_games=args.lanes, num_lanes=args.lanes,
                    flip_probability=0.5, alternate_colors=True)
    print(f"running {args.variant} at {args.lanes} lanes...", flush=True)
    res = A.play_duel(game, exp.netspec, a, b, sim, net, net,
                      jax.random.key(1))
    r = jax.block_until_ready(res.rewards)
    print(f"OK {args.variant} lanes={args.lanes}: avgr="
          f"{float(r.mean()):+.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
