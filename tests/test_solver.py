"""C++ connect-four solver: correctness against exhaustive python search.

Cross-checks the native alpha-beta solver against a brute-force negamax
written in python on late-game positions (small search spaces), plus known
tactical facts.
"""

import functools

import numpy as np
import pytest

from alphazero_tpu import solver


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


def _apply(moves):
    board = np.zeros((6, 7), np.int8)
    player = 1
    for ch in moves:
        c = int(ch) - 1
        r = int((board[:, c] != 0).sum())
        board[r, c] = player
        player = 3 - player
    return board, player


def _brute(board, player, plies):
    """Exact negamax score, same convention as the solver."""
    w = _winner(board)
    if w:  # previous mover won
        return -(42 - (plies - 1)) // 2 - 0  # loss for side to move
    if (board != 0).all():
        return 0
    best = None
    for c in range(7):
        if board[5, c] != 0:
            continue
        r = int((board[:, c] != 0).sum())
        board[r, c] = player
        if _winner(board) == player:
            s = (42 + 1 - plies) // 2
        else:
            s = -_brute(board, 3 - player, plies + 1)
        board[r, c] = 0
        best = s if best is None else max(best, s)
    return best


def _random_deep_position(rng, min_moves=36):
    """Random game avoiding immediate wins (and handing them out), so that
    deep non-terminal positions are actually reachable."""

    def wins(board, player, c):
        r = int((board[:, c] != 0).sum())
        board[r, c] = player
        w = _winner(board) == player
        board[r, c] = 0
        return w

    while True:
        board = np.zeros((6, 7), np.int8)
        moves = ""
        player = 1
        ok = True
        for i in range(min_moves):
            legal = [c for c in range(7) if board[5, c] == 0]
            safe = []
            for c in legal:
                if wins(board, player, c):
                    continue
                r = int((board[:, c] != 0).sum())
                board[r, c] = player
                gives_win = any(wins(board, 3 - player, c2)
                                for c2 in range(7) if board[5, c2] == 0)
                board[r, c] = 0
                if not gives_win:
                    safe.append(c)
            if not safe:
                ok = False
                break
            c = int(rng.choice(safe))
            r = int((board[:, c] != 0).sum())
            board[r, c] = player
            moves += str(c + 1)
            player = 3 - player
        if ok:
            return moves


def test_tactics():
    # white mates in one: three in a row at the bottom
    assert solver.solve("445566") is not None
    v = solver.move_values("445566")
    # column 7 (idx 6) or column 3 (idx 2) wins immediately for white
    assert v[6] == (43 - 6) // 2
    assert max(x for x in v if x is not None) == v[6]
    # full columns are marked illegal (None); use a deep position so the
    # remaining columns solve instantly (a near-root strong solve of a
    # balanced position costs minutes without an opening book)
    rng = np.random.default_rng(3)
    while True:
        moves = _random_deep_position(rng, min_moves=38)
        board, _ = _apply(moves)
        full = [c for c in range(7) if board[5, c] != 0]
        if full:
            break
    vals = solver.move_values(moves)
    assert all(vals[c] is None for c in full)
    assert all(vals[c] is not None for c in range(7) if c not in full)
    # invalid input
    assert solver.solve("8") is None


def test_against_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(12):
        moves = _random_deep_position(rng, min_moves=36)
        board, player = _apply(moves)
        expect = _brute(board.copy(), player, len(moves))
        got = solver.solve(moves)
        assert got == expect, (moves, got, expect)
        # weak solve agrees in sign
        weak = solver.solve(moves, weak=True)
        assert np.sign(weak) == np.sign(expect), (moves, weak, expect)


def test_move_values_consistent_with_solve():
    rng = np.random.default_rng(1)
    for _ in range(6):
        moves = _random_deep_position(rng, min_moves=35)
        vals = solver.move_values(moves)
        score = solver.solve(moves)
        best = max(v for v in vals if v is not None)
        assert best == score, (moves, vals, score)


def test_pons_dataset_scores_match_solver():
    """The shipped Pons ``Test_L*_R*`` files carry exact scores; the in-repo
    solver must reproduce them (exact on easy buckets, sign on medium)."""
    from alphazero_tpu.scripts.pons_benchmark import load_benchmarks
    benches = load_benchmarks()
    assert len(benches) == 6
    assert [f"{b.stage[0]}{b.difficulty[0]}" for b in benches] == \
        ["be", "me", "ee", "bm", "mm", "bh"]
    assert all(len(b.entries) == 1000 for b in benches)
    for b in benches:
        if b.difficulty == "hard":
            continue  # minutes per position without an opening book
        step = 211 if b.difficulty == "easy" else 499
        for mstr, score in b.entries[::step]:
            if b.difficulty == "easy":
                assert solver.solve(mstr) == score, (mstr, score)
            else:
                got = solver.solve(mstr, weak=True)
                assert np.sign(got) == np.sign(score), (mstr, score, got)


def test_pons_mistake_scoring():
    """``score_moves``/``SolveCache`` semantics: an optimal move scores 0
    mistakes, a blunder scores 1; budget-exceeded positions are skipped."""
    from alphazero_tpu.scripts import pons_benchmark as PB
    cache = PB.SolveCache(path="")
    # position "444444" is unplayable (column full): use a simple known one.
    # After "44" (both center), playing center again is optimal for white.
    entries = [("4455", solver.solve("4455"))]
    bench = PB.Bench("end", "easy", entries)
    opt = solver.optimal_moves("4455")[0]
    bad = next(c for c in range(7)
               if c != opt and solver.move_values("4455")[c] is not None
               and np.sign(solver.move_values("4455")[c])
               != np.sign(solver.solve("4455")))
    errs = PB.score_moves("t", {"end/easy": [opt]}, [bench], cache)
    assert errs == [0.0]
    errs = PB.score_moves("t", {"end/easy": [bad]}, [bench], cache)
    assert errs == [1.0]
