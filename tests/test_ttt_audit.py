"""Tests for the exact tictactoe state-space audit
(``scripts/ttt_audit.py``): the enumeration and retrograde solver it
rests on must match the game's known combinatorics and values."""

import numpy as np

from alphazero_tpu.scripts import ttt_audit as T


def test_enumeration_counts():
    # 5478 legal positions reachable from the empty board (standard
    # tictactoe combinatorics), 958 of them terminal.
    seen = T.enumerate_reachable()
    assert len(seen) == 5478
    nonterm = [(b, p) for (b, p) in seen
               if not T.winner(b) and any(c == 0 for c in b)]
    assert len(nonterm) == 4520


def test_exact_values():
    # Perfect play from the empty board draws.
    assert T.exact_value(tuple([0] * 9), T.WHITE) == 0.0
    # White to move with two in a row and the third cell open: win.
    # o o . / x x . / . . .  (white=1, black=2), white to move
    b = (1, 1, 0, 2, 2, 0, 0, 0, 0)
    assert T.exact_value(b, T.WHITE) == 1.0
    # Same board, black to move: black wins (plays cell 5).
    assert T.exact_value(b, T.BLACK) == -1.0
    # A full drawn board is worth 0 regardless of mover.
    full_draw = (1, 2, 1, 1, 2, 2, 2, 1, 1)
    assert T.winner(full_draw) == 0
    assert T.exact_value(full_draw, T.WHITE) == 0.0


def test_winner_lines():
    assert T.winner((1, 1, 1, 0, 0, 0, 0, 0, 0)) == 1   # row
    assert T.winner((2, 0, 0, 2, 0, 0, 2, 0, 0)) == 2   # col
    assert T.winner((1, 0, 0, 0, 1, 0, 0, 0, 1)) == 1   # diag
    assert T.winner((0, 0, 2, 0, 2, 0, 2, 0, 0)) == 2   # anti-diag
    assert T.winner(tuple([0] * 9)) == 0


def test_mover_pov():
    assert T.mover_pov(1.0, T.WHITE) == 1.0
    assert T.mover_pov(1.0, T.BLACK) == -1.0
