"""Probe: is the net UNDERFITTING its replay buffer, or are the targets noisy?

Round-3 diagnosis (VERDICT "what's weak" #1): the flagship's per-iteration
training barely moves the loss (iter 4: 0.75 -> 0.71 over 551 steps) and the
policy head never sharpens (Hpnet stuck at ~1.7-1.9 across 15 iterations),
while the reference's published loss-on-full-memory collapses within a few
iterations (Lv 1.8 -> 0.05, Lp -> ~0.1, ``docs/src/assets/img/connect-four/
plots/loss.png``).  Two hypotheses:

    (O) optimization-limited — the recipe (1 epoch of Adam 2e-3 per
        iteration, reinitialized each call) underfits; more epochs / a
        different schedule would crash the loss on the SAME data;
    (D) data-limited — our pi/z targets carry irreducible noise (blurrier
        search targets), so no amount of training fits them.

This script loads a saved session's replay buffer and trains a net on it
hard (many epochs), printing the full-memory loss decomposition after every
epoch.  If loss plateaus at the session's level, (D); if it keeps falling,
(O).  ``--fresh`` starts from a random init (removes any legacy-net
pathology); ``--subset N`` truncates the buffer to the most recent N samples
(capacity check: a 1.6M-param net must be able to overfit a few thousand
positions to ~the Lreg floor if the architecture/optimizer are sound).

Runs on the TPU (one chip client at a time — NOTES.md).
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import numpy as np

from .. import learning as learnmod
from .. import memory as memmod
from ..experiments import registry
from ..session.session import Session


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="sessions/c4-flagship")
    ap.add_argument("--experiment", default="connect-four")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=0,
                    help="steps per epoch (0 = reference formula)")
    ap.add_argument("--fresh", action="store_true",
                    help="train from a random init instead of curnn")
    ap.add_argument("--subset", type=int, default=0,
                    help="truncate the replay to its most recent N samples")
    ap.add_argument("--lr", type=float, default=0.0,
                    help="override Adam lr (0 = recipe value)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    exp = registry()[args.experiment]
    sess = Session(exp, dir=args.dir, autosave=False, quiet=True)
    assert not sess._fresh, f"no saved session in {args.dir}"
    env = sess.env
    lp = env.params.learning
    if args.lr:
        lp = dataclasses.replace(
            lp, optimiser=dataclasses.replace(lp.optimiser, lr=args.lr))

    replay = env.replay
    if args.subset:
        replay = memmod.resize(env.game, replay, args.subset)
    net = env.curnn
    if args.fresh:
        net = env.network.init(jax.random.key(args.seed))

    rng = jax.random.key(args.seed + 1)
    trainer = learnmod.Trainer(env.game, env.netspec, net, replay, lp,
                               env.params.use_symmetries, rng)
    nsteps = args.steps or trainer.batches_per_checkpoint()
    print(f"dir={args.dir} fresh={args.fresh} subset={args.subset or 'full'} "
          f"samples={trainer.num_samples} steps/epoch={nsteps} "
          f"lr={args.lr or lp.optimiser.lr}", flush=True)

    def show(tag, st):
        l = st.loss
        print(f"{tag}: L={l.L:.4f} Lp={l.Lp:.4f} Lv={l.Lv:.4f} "
              f"Lreg={l.Lreg:.4f} Linv={l.Linv:.5f} Hp={st.Hp:.3f} "
              f"Hpnet={st.Hpnet:.3f}", flush=True)

    show("init   ", trainer.learning_status())
    for e in range(args.epochs):
        lvals = trainer.batch_updates(nsteps)
        st = trainer.learning_status()
        show(f"epoch {e + 1:2d}", st)
        print(f"         step-loss first={lvals[0]:.3f} "
              f"last={lvals[-1]:.3f} min={lvals.min():.3f}", flush=True)


if __name__ == "__main__":
    main()
