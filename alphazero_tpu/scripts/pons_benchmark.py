"""Mistake rate on Pascal Pons' 6000-position benchmark — the faithful
ground-truth protocol.

Re-design of
``/root/reference/games/connect-four/scripts/pons_benchmark.jl``: score the
minmax baseline, the trained agent, and (when per-iteration environments
were saved with ``--save-intermediate``) the agent across training
iterations, on the published ``Test_L*_R*`` sets shipped in
``alphazero_tpu/data/pons`` (6 buckets of game stage x difficulty,
``pons_benchmark.jl:18-45``).

Protocol per position (``optimal_on``, ``pons_benchmark.jl:101-107``): the
player thinks on the position, its argmax move ``a`` is a mistake iff
``sign(q(a)) != max_a' sign(q(a'))``.  The maximum over move-value signs
equals the sign of the position's own score — which the dataset provides —
so only ONE weak solve (of the chosen move's child) is needed per position;
solves go through the in-repo C++ solver with a persistent on-disk cache.

Where the reference fans positions out to async worker players over a
batching server (``pons_benchmark.jl:110-133``), here each bucket's 1000
positions are evaluated as a few batched MCTS dispatches.

Usage:
    python -m alphazero_tpu.scripts.pons_benchmark sessions/c4-flagship \
        [--lanes 250] [--skip-minmax] [--max-iters 15] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Tuple

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "pons")

STAGES = ["beginning", "middle", "end"]
DIFFICULTIES = ["easy", "medium", "hard"]


@dataclasses.dataclass
class Bench:
    """(``pons_benchmark.jl:43-47``)"""

    stage: str
    difficulty: str
    entries: List[Tuple[str, int]]   # (move string, exact score)


def load_benchmarks(data_dir: str = DATA_DIR) -> List[Bench]:
    """(``load_benchmarks``, ``pons_benchmark.jl:49-75``; sorted by
    (difficulty, stage) like the reference)."""
    import re
    benches = []
    for fn in sorted(os.listdir(data_dir)):
        m = re.match(r"^Test_L(\d)_R(\d)$", fn)
        if not m:
            continue
        stage = STAGES[int(m.group(1)) - 1]
        difficulty = DIFFICULTIES[int(m.group(2)) - 1]
        entries = []
        with open(os.path.join(data_dir, fn)) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    entries.append((parts[0], int(parts[1])))
        benches.append(Bench(stage, difficulty, entries))
    benches.sort(key=lambda b: (DIFFICULTIES.index(b.difficulty),
                                STAGES.index(b.stage)))
    return benches


class SolveCache:
    """Persistent weak-solve cache: move-string -> win/draw/loss sign.

    Solves accumulate across agents and training iterations (the per-move
    child positions repeat heavily), so the expensive begin-hard children
    are paid for once per repo, not once per sweep.  This is the
    "opening cache" companion to the solver's in-process transposition
    tables: the TT warms *within* a sweep, the JSON cache *across* runs.
    """

    def __init__(self, path: str):
        self.path = path
        self.data: Dict[str, int] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)
        self._dirty = 0

    def sign_after(self, moves: str, col0: int,
                   node_limit: int = 0) -> Optional[int]:
        """Sign of the mover's value for playing column ``col0`` (0-based)
        in the position ``moves`` — i.e. -sign(child score).  ``None`` when
        the solve exceeded ``node_limit`` (counted as skipped upstream)."""
        from .. import solver as S
        child = moves + str(col0 + 1)
        hit = self.data.get(child)
        if hit is not None:
            return hit
        try:
            res = S.solve(child, weak=True, node_limit=node_limit)
        except S.BudgetExceeded:
            return None
        if res is None:
            # invalid child: the move ends the game (win for the mover) or
            # the column is illegal; resolve via move_values on the parent
            try:
                vals = S.move_values(moves, weak=True,
                                     node_limit=node_limit)
            except S.BudgetExceeded:
                return None
            v = vals[col0]
            sign = 0 if v is None else int((v > 0) - (v < 0))
        else:
            sign = int(-((res > 0) - (res < 0)))
        self.data[child] = sign
        self._dirty += 1
        if self._dirty >= 50:
            self.save()
        return sign

    def save(self):
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f)
        os.replace(tmp, self.path)
        self._dirty = 0


def _states_batch(entries):
    """Vectorized dataset loader: all positions of a bucket as ONE batched
    ``C4State`` (pure numpy move replay — ``game.read_state`` per position
    would cost tens of thousands of eager device dispatches)."""
    import jax.numpy as jnp
    import numpy as np

    n = len(entries)
    boards = np.zeros((n, 6, 7), np.int8)
    players = np.zeros(n, np.int32)
    heights = np.zeros(7, np.int32)
    for i, (moves, _) in enumerate(entries):
        heights[:] = 0
        p = 1
        b = boards[i]
        for ch in moves:
            c = int(ch) - 1
            b[heights[c], c] = p
            heights[c] += 1
            p = 3 - p
        players[i] = p - 1  # 1-> WHITE(0), 2 -> 1
    from ..envs.connect_four import C4State
    return C4State(board=jnp.asarray(boards),
                   player=jnp.asarray(players),
                   done=jnp.zeros(n, bool),
                   rew=jnp.zeros(n, jnp.float32))


def _batched_argmax_player(game, think, lanes: int):
    """Evaluate ``think`` over positions in fixed-size batches, returning
    the argmax move per position."""
    import jax
    import numpy as np

    def run(states, rng):
        n = jax.tree.leaves(states)[0].shape[0]
        moves = np.zeros(n, np.int32)
        for base in range(0, n, lanes):
            m = min(lanes, n - base)
            idx = np.arange(base, base + lanes) % n  # wrap-pad
            batch = jax.tree.map(lambda x: x[idx], states)
            rng, sub = jax.random.split(rng)
            pi = think(batch, sub)
            moves[base:base + m] = np.argmax(np.asarray(pi)[:m], axis=-1)
        return moves

    return run


def make_alphazero_think(game, netspec, net, mcts_params):
    """Arena-params agent with zero temperature and no noise
    (``test_alphazero``, ``pons_benchmark.jl:160-168``)."""
    import jax

    from .. import arena as A
    from ..utils.schedules import ConstSchedule

    mp = mcts_params.replace(temperature=ConstSchedule(0.0),
                             dirichlet_noise_eps=0.0)
    spec = A.Full(mp)
    think_fn, _ = spec.make_think(game, netspec)
    jitted = jax.jit(lambda states, rng: think_fn(net, states, 0, rng))
    return jitted


def make_minmax_think(game, depth: int = 5):
    """(``pons_benchmark.jl:172-174``)"""
    import jax

    from .. import arena as A

    spec = A.MinMaxTS(depth=depth, amplify_rewards=True, tau=0.0)
    think_fn, _ = spec.make_think(game, None)
    return jax.jit(lambda states, rng: think_fn(None, states, 0, rng))


def think_player(name, think, benches, game, lanes: int,
                 moves_store: Optional[dict] = None) -> Dict[str, List[int]]:
    """Phase 1 (accelerator): the player's argmax move on every position.

    Decoupled from the solve phase so the thinks can run on the TPU while
    the (CPU-only) solver grinds in parallel; results persist in
    ``moves_store[name]``.
    """
    import zlib

    import jax
    runner = _batched_argmax_player(game, think, lanes)
    base_key = jax.random.key(7)
    out = {} if moves_store is None else moves_store.setdefault(name, {})
    for b in benches:
        bkey = f"{b.stage}/{b.difficulty}"
        # stored moves are aligned with the bucket-file prefix, so a
        # previous full run covers any --limit'ed rerun; rethink only
        # when the store has FEWER positions than requested
        if len(out.get(bkey, [])) >= len(b.entries):
            continue
        t0 = time.time()
        states = _states_batch(b.entries)
        # deterministic per-bucket key (ADVICE r4): fold the bucket name
        # into the base key so which buckets were already stored/skipped
        # cannot shift another bucket's RNG stream — a resumed partial run
        # reproduces a fresh full run exactly
        sub = jax.random.fold_in(base_key, zlib.crc32(bkey.encode()))
        out[bkey] = [int(a) for a in runner(states, sub)]
        print(f"  think {name} ({bkey}): {time.time() - t0:.0f}s",
              flush=True)
    return out


def score_moves(name, moves_by_bucket, benches, cache: SolveCache,
                node_limit: int = 0, log=print, on_bucket=None) -> List[float]:
    """Phase 2 (CPU): error rate per bucket (``test_player``,
    ``pons_benchmark.jl:135-145``).  Positions whose child solve exceeds
    ``node_limit`` are reported as skipped and excluded from the rate.
    ``on_bucket(errs_so_far)`` fires after each bucket so long sweeps dump
    partial results incrementally."""
    errs = []
    for b in benches:
        bkey = f"{b.stage}/{b.difficulty}"
        moves = moves_by_bucket[bkey]
        if len(moves) < len(b.entries):
            raise SystemExit(
                f"stored moves for {name} ({bkey}) cover only "
                f"{len(moves)}/{len(b.entries)} positions; rerun the think "
                f"phase (or pass --limit {len(moves)})")
        t0 = time.time()
        n_err = n_skip = 0
        for (mstr, score), a in zip(b.entries, moves):
            best_sign = (score > 0) - (score < 0)
            got = cache.sign_after(mstr, int(a), node_limit)
            if got is None:
                n_skip += 1
            else:
                n_err += int(got != best_sign)
        n_scored = len(b.entries) - n_skip
        err = n_err / max(n_scored, 1)
        errs.append(err)
        skip_note = f", {n_skip} over budget" if n_skip else ""
        log(f"  ({b.stage}, {b.difficulty}): {100 * err:.2f}%  "
            f"[{n_scored} scored{skip_note}, {time.time() - t0:.0f}s]",
            flush=True)
        cache.save()
        if on_bucket is not None:
            on_bucket(list(errs))
    return errs


def plot_results(results: dict, benches, out_png: str):
    """3x2 grid of per-bucket error-rate curves with the minmax hline
    (``plot_results``, ``pons_benchmark.jl:232-262``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    azt = results.get("alphazero_training") or []
    fig, axes = plt.subplots(3, 2, figsize=(10, 11))
    for n, b in enumerate(benches):
        ax = axes[n // 2][n % 2]
        title = f"{b.stage.capitalize()} - {b.difficulty.capitalize()}"
        pts = sorted((itc, errs[n]) for itc, errs in azt
                     if n < len(errs) and errs[n] is not None)
        if pts:
            ax.plot([p[0] for p in pts], [100 * p[1] for p in pts],
                    marker="o", ms=3)
        az = results.get("alphazero") or []
        if n < len(az) and az[n] is not None:
            ax.axhline(100 * az[n], color="green",
                       lw=0.8, ls=":", label="final agent")
        mm = results.get("minmax") or []
        if n < len(mm) and mm[n] is not None:
            ax.axhline(100 * mm[n], color="red", lw=0.8,
                       ls="--", label="minmax-5")
        ax.set_title(title, fontsize=10)
        ax.set_ylabel("Error rate (%)")
        ax.set_ylim(0, None)
        ax.grid(alpha=0.3)
        if n == 0:
            ax.legend(fontsize=8)
    for ax in axes[-1]:
        ax.set_xlabel("Training iteration")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("session_dir", nargs="?", default="sessions/c4-flagship")
    ap.add_argument("--lanes", type=int, default=250)
    ap.add_argument("--skip-minmax", action="store_true")
    ap.add_argument("--skip-final", action="store_true")
    ap.add_argument("--max-iters", type=int, default=15)
    ap.add_argument("--iter-stride", type=int, default=1)
    ap.add_argument("--buckets", default=None,
                    help="comma-separated subset, e.g. 'end/easy,middle/easy'")
    ap.add_argument("--phase", default="all",
                    choices=["all", "think", "solve"],
                    help="'think' = run the players (TPU) and store moves; "
                         "'solve' = score stored moves (CPU only)")
    ap.add_argument("--node-limit", type=int, default=0,
                    help="per-solve node budget (0 = unlimited); positions "
                         "over budget are reported as skipped")
    ap.add_argument("--agents", default=None,
                    help="comma-separated agent order/filter, e.g. "
                         "'alphazero,minmax' (default: minmax, alphazero, "
                         "then per-iteration snapshots)")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap positions per bucket (0 = all 1000); makes "
                         "per-iteration training sweeps affordable — the "
                         "bucket files are pre-shuffled so a prefix is an "
                         "unbiased subsample")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cache", default="sessions/pons_solve_cache.json")
    args = ap.parse_args(argv)

    benches = load_benchmarks()
    if args.buckets:
        keep = set(args.buckets.split(","))
        benches = [b for b in benches
                   if f"{b.stage}/{b.difficulty}" in keep]
    if args.limit:
        benches = [dataclasses.replace(b, entries=b.entries[:args.limit])
                   for b in benches]

    moves_path = os.path.join(args.session_dir, "pons-moves.json")
    moves_store: dict = {}
    if os.path.exists(moves_path):
        with open(moves_path) as f:
            moves_store = json.load(f)

    from ..experiments import connect_four
    exp = connect_four.experiment()
    game = exp.game

    agents = []  # (name, kind, itc)
    if not args.skip_minmax:
        agents.append(("minmax", "minmax", None))
    if not args.skip_final:
        agents.append(("alphazero", "session", None))
    itc = 0
    while itc <= args.max_iters:
        if os.path.isdir(os.path.join(args.session_dir, f"iter_{itc}")):
            agents.append((f"iter{itc}", "session", itc))
        itc += args.iter_stride
    if args.agents:
        order = args.agents.split(",")
        by_name = {n: (n, k, i) for n, k, i in agents}
        unknown = [n for n in order if n not in by_name]
        if unknown:
            raise SystemExit(
                f"--agents: unknown agent(s) {unknown}; "
                f"available: {sorted(by_name)}")
        agents = [by_name[n] for n in order]

    # ---- phase 1: thinks (accelerator-bound) ----------------------------
    if args.phase in ("all", "think"):
        # eval-only load — fails loudly on an incomplete snapshot dir
        # instead of silently thinking with a fresh random net (ADVICE r3)
        from ..session.session import load_eval_net
        from ..utils import canary as canarymod
        print(f"canary: {canarymod.summary(canarymod.validate_chip())}")
        mcts_params = exp.params.arena.mcts
        for name, kind, it in agents:
            store = moves_store.get(name, {})
            # covered = stored moves for at least as many positions as
            # requested (stores are bucket-file-prefix aligned, so longer
            # stores satisfy shorter runs; a bare key test would skip
            # agents whose store predates a larger --limit)
            if all(len(store.get(f"{b.stage}/{b.difficulty}", []))
                   >= len(b.entries) for b in benches):
                continue
            print(f"Thinking: {name}")
            if kind == "minmax":
                think = make_minmax_think(game, depth=5)
            else:
                d = (args.session_dir if it is None
                     else os.path.join(args.session_dir, f"iter_{it}"))
                snap = load_eval_net(exp, d)
                think = make_alphazero_think(
                    game, exp.netspec, snap.bestnn, mcts_params)
            think_player(name, think, benches, game, args.lanes,
                         moves_store)
            tmp = moves_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(moves_store, f)
            os.replace(tmp, moves_path)

    results = {"minmax": None, "alphazero": None, "alphazero_training": []}

    # ---- phase 2: solver scoring (CPU-bound) ----------------------------
    if args.phase in ("all", "solve"):
        cache = SolveCache(args.cache)
        out = args.out or os.path.join(args.session_dir,
                                       "pons-benchmark-results.json")
        bucket_keys = [f"{b.stage}/{b.difficulty}" for b in benches]
        if os.path.exists(out):
            # merge over previous results: a filtered --agents run must not
            # clobber other agents' scores with None/[] (only when the
            # bucket list matches — indices are positional)
            with open(out) as f:
                prev = json.load(f)
            if prev.get("buckets") == bucket_keys:
                results["minmax"] = prev.get("minmax")
                results["alphazero"] = prev.get("alphazero")
                results["alphazero_training"] = [
                    (e[0], e[1]) for e in
                    (prev.get("alphazero_training") or [])]
            elif not args.out:
                # a --buckets-filtered run must not clobber previously
                # computed full-bucket scores at the default path
                # (ADVICE r3): demand an explicit --out instead
                raise SystemExit(
                    f"{out} holds results for buckets "
                    f"{prev.get('buckets')} but this run scores "
                    f"{bucket_keys}; pass an explicit --out to write "
                    "them elsewhere")

        def pad(errs):
            # pad partial per-bucket lists to full length with null so
            # consumers can index any bucket and detect incompleteness
            if errs is None:
                return None
            return list(errs) + [None] * (len(benches) - len(errs))

        def dump():  # incremental: partial sweeps survive interruption
            payload = dict(results)
            payload["minmax"] = pad(results["minmax"])
            payload["alphazero"] = pad(results["alphazero"])
            payload["alphazero_training"] = sorted(
                (it, pad(errs)) for it, errs in
                results["alphazero_training"])
            payload["buckets"] = bucket_keys
            payload["node_limit"] = args.node_limit
            # per-bucket counts (ADVICE r4): a scalar max overstates
            # coverage for smaller buckets and crashes on an empty
            # --buckets filter
            counts = {f"{b.stage}/{b.difficulty}": len(b.entries)
                      for b in benches}
            payload["positions_by_bucket"] = counts
            payload["positions_per_bucket"] = (
                max(counts.values()) if counts else 0)
            with open(out, "w") as f:
                json.dump(payload, f, indent=2)

        for name, kind, it in agents:
            if name not in moves_store:
                print(f"(no stored moves for {name}; run --phase think)")
                continue
            print(f"Scoring: {name}", flush=True)

            def on_bucket(partial, name=name, it=it):
                if name == "minmax":
                    results["minmax"] = partial
                elif name == "alphazero":
                    results["alphazero"] = partial
                else:
                    results["alphazero_training"] = [
                        e for e in results["alphazero_training"]
                        if e[0] != it] + [(it, partial)]
                dump()

            errs = score_moves(name, moves_store[name], benches, cache,
                               args.node_limit, on_bucket=on_bucket)
        print(f"results -> {out}")
        if len(benches) == 6:
            png = out.rsplit(".", 1)[0] + ".png"
            plot_results(results, benches, png)
            print(f"plot -> {png}")
    return results


if __name__ == "__main__":
    main()
