"""OFFLINE-GENERATED mistake-rate benchmark — the fallback protocol.

NOTE: ``scripts/pons_benchmark.py`` is THE ground-truth protocol (it scores
agents on Pascal Pons' published 6000-position ``Test_L*_R*`` sets, shipped
in ``alphazero_tpu/data/pons``, exactly as the reference's
``games/connect-four/scripts/pons_benchmark.jl`` does).  Use that for any
number that gets compared against the reference.

This script is the dataset *generator* variant, kept for environments where
the published test files are unavailable: it builds an equivalent set
locally — random (blunder-free) playouts truncated at random depths, labeled
exactly by the in-repo solver, with difficulty measured by solver node
count — and scores agents on it.  Bucket boundaries are therefore NOT
comparable position-for-position with the published sets.

A "mistake" is a move whose exact value class (win/draw/loss) is strictly
worse than the best achievable class in the position.

Usage:
    python -m alphazero_tpu.scripts.mistake_rate [session_dir] [--n 600]
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import solver
from ..envs import registry as game_registry


@dataclasses.dataclass
class TestPosition:
    moves: str        # 1-based column string
    values: List[Optional[int]]   # exact value per column (None = illegal)
    nodes: int        # solver work for the position (difficulty proxy)

    @property
    def best_class(self) -> int:
        best = max(v for v in self.values if v is not None)
        return int(np.sign(best))


def _play_board(moves: str):
    board = np.zeros((6, 7), np.int8)
    player = 1
    for ch in moves:
        c = int(ch) - 1
        r = int((board[:, c] != 0).sum())
        board[r, c] = player
        player = 3 - player
    return board, player


def _winner(board):
    for p in (1, 2):
        m = (board == p).astype(int)
        for w in (m[:, :4] + m[:, 1:5] + m[:, 2:6] + m[:, 3:7],
                  m[:3] + m[1:4] + m[2:5] + m[3:6],
                  m[:3, :4] + m[1:4, 1:5] + m[2:5, 2:6] + m[3:6, 3:7],
                  m[3:, :4] + m[2:5, 1:5] + m[1:4, 2:6] + m[:3, 3:7]):
            if (w >= 4).any():
                return p
    return 0


def generate_positions(n: int, seed: int = 0,
                       min_ply: int = 4, max_ply: int = 36,
                       node_limit: int = 20_000_000
                       ) -> List[TestPosition]:
    """Random reachable non-terminal positions with exact solver labels.

    Positions whose exact labeling exceeds ``node_limit`` solver nodes per
    column are skipped (and counted): without an opening book, a balanced
    sub-10-ply strong solve can take minutes — the same reason Pascal Pons
    ships precomputed ``Test_L*_R*`` sets.  The skip count is reported so
    the cap is never silent.
    """
    rng = np.random.default_rng(seed)
    out: List[TestPosition] = []
    seen = set()
    skipped = 0
    while len(out) < n:
        target = int(rng.integers(min_ply, max_ply + 1))
        board = np.zeros((6, 7), np.int8)
        moves = ""
        player = 1
        for _ in range(target):
            legal = [c for c in range(7) if board[5, c] == 0]
            if not legal:
                break
            c = int(rng.choice(legal))
            r = int((board[:, c] != 0).sum())
            board[r, c] = player
            if _winner(board):
                board[r, c] = 0
                break
            moves += str(c + 1)
            player = 3 - player
        if len(moves) < min_ply or moves in seen:
            continue
        seen.add(moves)
        try:
            _, nodes = solver.solve_with_nodes(moves, node_limit=node_limit)
            values = solver.move_values(moves, node_limit=node_limit)
        except solver.BudgetExceeded:
            skipped += 1
            continue
        out.append(TestPosition(moves=moves, values=values, nodes=nodes))
    if skipped:
        print(f"# generate_positions: skipped {skipped} positions over the "
              f"{node_limit}-node solver budget")
    return out


def _stage(p: TestPosition) -> str:
    n = len(p.moves)
    return "beginning" if n < 14 else ("middle" if n < 28 else "end")


def evaluate_agent(think_fn, positions: List[TestPosition],
                   batch_size: int = 256) -> np.ndarray:
    """``think_fn(states) -> pi [B, 7]``; returns per-position mistake flags."""
    game = game_registry()["connect-four"]
    mistakes = np.zeros(len(positions), bool)
    for start in range(0, len(positions), batch_size):
        chunk = positions[start:start + batch_size]
        states = []
        for p in chunk:
            board, player = _play_board(p.moves)
            states.append(game.init()._replace(
                board=jnp.asarray(board),
                player=jnp.asarray(player - 1, jnp.int32)))
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        pi = np.asarray(think_fn(batch))
        for j, p in enumerate(chunk):
            legal = np.asarray([v is not None for v in p.values])
            masked = np.where(legal, pi[j], -1.0)
            a = int(masked.argmax())
            cls = int(np.sign(p.values[a])) if p.values[a] is not None else -1
            mistakes[start + j] = cls < p.best_class
    return mistakes


def bucketed_report(positions: List[TestPosition],
                    mistakes: np.ndarray) -> Dict:
    """Six buckets: stage x difficulty tercile (``pons_benchmark.jl:18-45``)."""
    nodes = np.asarray([p.nodes for p in positions], np.float64)
    t1, t2 = np.quantile(nodes, [1 / 3, 2 / 3])

    def difficulty(p):
        return ("easy" if p.nodes <= t1
                else ("medium" if p.nodes <= t2 else "hard"))

    report: Dict = {"overall_mistake_rate": float(mistakes.mean()),
                    "num_positions": len(positions), "buckets": {}}
    for stage in ("beginning", "middle", "end"):
        for diff in ("easy", "medium", "hard"):
            idx = [i for i, p in enumerate(positions)
                   if _stage(p) == stage and difficulty(p) == diff]
            if idx:
                report["buckets"][f"{stage}/{diff}"] = {
                    "n": len(idx),
                    "mistake_rate": float(mistakes[idx].mean())}
    return report


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("session_dir", nargs="?", default=None,
                    help="session to evaluate (default: raw network-free "
                         "MCTS-rollouts agent)")
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--positions", default=None,
                    help="JSON cache of solver-labeled positions: generated "
                         "and saved if missing (CPU-only), loaded otherwise")
    ap.add_argument("--generate-only", action="store_true")
    args = ap.parse_args(argv)

    import os
    if args.positions and os.path.exists(args.positions):
        with open(args.positions) as f:
            positions = [TestPosition(**d) for d in json.load(f)]
        print(f"loaded {len(positions)} labeled positions "
              f"from {args.positions}")
    else:
        print(f"generating + solving {args.n} positions...")
        positions = generate_positions(args.n, seed=args.seed)
        if args.positions:
            with open(args.positions, "w") as f:
                json.dump([dataclasses.asdict(p) for p in positions], f)
            print(f"saved to {args.positions}")
    if args.generate_only:
        return
    game = game_registry()["connect-four"]

    from .. import arena as A
    from ..config import MctsParams
    if args.session_dir:
        from ..experiments import registry as exp_registry
        from ..session import Session
        exp = exp_registry()["connect-four"]
        session = Session(exp, dir=args.session_dir, quiet=True)
        spec = A.Full(exp.params.arena.mcts.replace(
            num_iters_per_turn=args.sims))
        think, _ = spec.make_think(game, exp.netspec)
        net = session.env.bestnn
    else:
        spec = A.MctsRollouts(MctsParams(num_iters_per_turn=args.sims,
                                         cpuct=1.0))
        think, _ = spec.make_think(game, None)
        net = None

    fn = jax.jit(lambda s, k: think(net, s, 10**9, k))
    rng = jax.random.key(args.seed)

    def think_fn(states):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return fn(states, k)

    mistakes = evaluate_agent(think_fn, positions)
    report = bucketed_report(positions, mistakes)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
