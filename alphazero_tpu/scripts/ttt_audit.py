"""Exact state-space audit of a trained tictactoe network.

Tictactoe is fully enumerable (5478 legal positions, 4520 of them
non-terminal), so the quality of a trained net can be measured *exactly*
instead of sampled through duels: this script enumerates every reachable
position, computes the game-theoretic value of every move by retrograde
negamax, runs the network over all positions in one batch, and reports

  * value-sign accuracy (net value vs exact minimax value),
  * argmax-policy optimality (does the most-likely move preserve the
    game-theoretic value?),
  * the exact blunder mass the tau=1.0 ``NetworkOnly`` player puts on
    value-losing moves, and the induced *exact* per-game loss probability
    against a perfect opponent (computed by dynamic programming over the
    full tree, both for worst-case and uniform-over-optimal tie-breaking).

The last number is the theoretical floor for the reference benchmark row
``NetworkOnly vs MinMaxTS(depth=6)`` (``games/tictactoe/params.jl:76-84``):
the reference's NetworkOnly *samples* from the raw policy at tau=1.0
(``src/benchmark.jl:126-133``), so any soft policy loses games at exactly
the rate this DP predicts, no matter how good its argmax is.

Usage:
    python -m alphazero_tpu.scripts.ttt_audit sessions/tictactoe [--out x.json]
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np

WHITE, BLACK = 0, 1
LINES = np.asarray(
    [[0, 1, 2], [3, 4, 5], [6, 7, 8],
     [0, 3, 6], [1, 4, 7], [2, 5, 8],
     [0, 4, 8], [2, 4, 6]], np.int32)


def winner(board: tuple) -> int:
    """0 none / 1 white / 2 black."""
    b = np.asarray(board)
    for cell in (1, 2):
        if np.any(np.all(b[LINES] == cell, axis=-1)):
            return cell
    return 0


def enumerate_reachable():
    """BFS over reachable positions.  Returns dict key->(board, player)
    for every reachable position (terminal and not)."""
    init = (tuple([0] * 9), WHITE)
    seen = {init}
    frontier = [init]
    while frontier:
        nxt = []
        for board, player in frontier:
            if winner(board) or all(c != 0 for c in board):
                continue
            cell = player + 1
            for a in range(9):
                if board[a] == 0:
                    child = (tuple(
                        cell if i == a else board[i] for i in range(9)),
                        1 - player)
                    if child not in seen:
                        seen.add(child)
                        nxt.append(child)
        frontier = nxt
    return seen


@functools.lru_cache(maxsize=None)
def exact_value(board: tuple, player: int) -> float:
    """White-POV minimax value (+1 white win / 0 draw / -1 black win)."""
    w = winner(board)
    if w:
        return 1.0 if w == 1 else -1.0
    if all(c != 0 for c in board):
        return 0.0
    cell = player + 1
    vals = []
    for a in range(9):
        if board[a] == 0:
            child = tuple(cell if i == a else board[i] for i in range(9))
            vals.append(exact_value(child, 1 - player))
    return max(vals) if player == WHITE else min(vals)


def mover_pov(v_white: float, player: int) -> float:
    return v_white if player == WHITE else -v_white


def audit(session_dir: str):
    import jax
    import jax.numpy as jnp

    from ..envs.tictactoe import GAME, TTTState
    from ..experiments import tictactoe as ttt_exp
    from ..models.interface import Network
    from ..session.session import load_eval_net

    exp = ttt_exp.experiment()
    snap = load_eval_net(exp, session_dir)
    model = Network(GAME, exp.netspec)

    states = sorted(enumerate_reachable())
    nonterm = [(b, p) for (b, p) in states
               if not winner(b) and any(c == 0 for c in b)]
    boards = np.asarray([b for b, _ in nonterm], np.int8)
    players = np.asarray([p for _, p in nonterm], np.int32)
    n = len(nonterm)

    sts = TTTState(
        board=jnp.asarray(boards),
        player=jnp.asarray(players),
        done=jnp.zeros((n,), bool),
        rew=jnp.zeros((n,), jnp.float32))
    obs = jax.vmap(GAME.observe)(sts)
    mask = jax.vmap(GAME.legal_mask)(sts)
    pnorm, _, v, _ = model.forward_normalized(snap.bestnn, obs, mask)
    pnorm = np.asarray(pnorm, np.float64)
    v = np.asarray(v, np.float64).reshape(-1)

    # Exact child values (mover POV): +1 best .. -1 worst for the mover.
    child_v = np.full((n, 9), -np.inf)
    cur_v = np.zeros(n)
    for i, (b, p) in enumerate(nonterm):
        cur_v[i] = mover_pov(exact_value(b, p), p)
        cell = p + 1
        for a in range(9):
            if b[a] == 0:
                child = tuple(cell if k == a else b[k] for k in range(9))
                child_v[i, a] = mover_pov(exact_value(child, 1 - p), p)

    legal = np.asarray(mask)
    optimal = legal & (child_v >= cur_v[:, None] - 1e-9)
    argmax = pnorm.argmax(axis=1)
    argmax_opt = optimal[np.arange(n), argmax]
    # "Blunder" mass: probability on moves that strictly worsen the
    # mover's game-theoretic value.
    blunder_mass = np.where(legal & ~optimal, pnorm, 0.0).sum(axis=1)
    # Value-sign accuracy, mover POV, on decisive + drawn positions.
    sign_ok = np.sign(np.round(v * 2) / 2) == np.sign(cur_v)
    # weight early positions more like play does?  No — report both raw
    # and ply-bucketed.
    ply = (boards != 0).sum(axis=1)

    idx = {s: i for i, s in enumerate(nonterm)}

    def loss_prob(net_color: int, tie_break: str) -> float:
        """Exact P[net eventually loses] vs a perfect opponent, net
        sampling from pnorm at tau=1.0, by memoized DP."""
        memo = {}

        def rec(b, p):
            w = winner(b)
            if w:
                return 1.0 if (w - 1) != net_color else 0.0
            if all(c != 0 for c in b):
                return 0.0
            key = (b, p)
            if key in memo:
                return memo[key]
            i = idx[key]
            cell = p + 1
            if p == net_color:
                out = 0.0
                for a in range(9):
                    if b[a] == 0 and pnorm[i, a] > 0:
                        child = tuple(
                            cell if k == a else b[k] for k in range(9))
                        out += pnorm[i, a] * rec(child, 1 - p)
            else:
                opts = []
                for a in range(9):
                    if b[a] == 0 and optimal[i, a]:
                        child = tuple(
                            cell if k == a else b[k] for k in range(9))
                        opts.append(rec(child, 1 - p))
                out = (max(opts) if tie_break == "worst"
                       else float(np.mean(opts)))
            memo[key] = out
            return out

        return rec(tuple([0] * 9), WHITE)

    report = {
        "session": session_dir,
        "iteration": snap.iteration,
        "num_positions": n,
        "argmax_optimal_pct": 100.0 * float(argmax_opt.mean()),
        "argmax_optimal_by_ply": {
            int(k): 100.0 * float(argmax_opt[ply == k].mean())
            for k in sorted(set(ply.tolist()))},
        "value_sign_acc_pct": 100.0 * float(sign_ok.mean()),
        "mean_blunder_mass": float(blunder_mass.mean()),
        "max_blunder_mass": float(blunder_mass.max()),
        "positions_with_blunder_mass_gt_1pct":
            int((blunder_mass > 0.01).sum()),
        "tau1_loss_floor": {
            "as_white_worst_tiebreak": loss_prob(WHITE, "worst"),
            "as_black_worst_tiebreak": loss_prob(BLACK, "worst"),
            "as_white_uniform_tiebreak": loss_prob(WHITE, "uniform"),
            "as_black_uniform_tiebreak": loss_prob(BLACK, "uniform"),
        },
    }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    rep = audit(args.dir)
    floors = rep["tau1_loss_floor"]
    print(json.dumps(rep, indent=2))
    avg_floor = 0.5 * (floors["as_white_worst_tiebreak"]
                       + floors["as_black_worst_tiebreak"])
    print(f"\nArgmax policy optimal on {rep['argmax_optimal_pct']:.2f}% "
          f"of {rep['num_positions']} reachable positions")
    print(f"Exact tau=1.0 NetworkOnly loss floor vs perfect play "
          f"(color-averaged, worst tie-break): {100 * avg_floor:.1f}%")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
