"""ctypes bindings for the in-repo C++ connect-four solver.

Replaces the reference's subprocess protocol to an *external* solver binary
(``/root/reference/games/connect-four/solver.jl:17-56``) with an in-process
native library (``native/c4solver/solver.cpp``), compiled on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "c4solver", "solver.cpp")
_LIB = os.path.join(_REPO, "native", "c4solver", "libc4solver.so")

INVALID = -100
ABORTED = -101   # node budget exhausted
IMMEDIATE_WIN = 100

_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
        check=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.c4_solve.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_longlong)]
        lib.c4_solve.restype = ctypes.c_int
        lib.c4_solve_limited.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong)]
        lib.c4_solve_limited.restype = ctypes.c_int
        lib.c4_solve_moves.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int)]
        lib.c4_solve_moves.restype = None
        lib.c4_solve_moves_limited.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int)]
        lib.c4_solve_moves_limited.restype = None
        _lib = lib
        return lib


class BudgetExceeded(Exception):
    """A solve hit its node budget before resolving the position."""


def solve(moves: str, weak: bool = False,
          node_limit: int = 0) -> Optional[int]:
    """Exact score of the position reached by ``moves`` (1-based column
    string, e.g. "44451"), for the player to move.  None on invalid input.

    Score convention: 0 draw; +s forced win (faster wins score higher);
    -s forced loss.  ``weak=True`` only resolves the win/draw/loss class.
    ``node_limit > 0`` raises :class:`BudgetExceeded` past that many nodes
    (near-root strong solves of balanced positions are expensive without an
    opening book).
    """
    score, _ = solve_with_nodes(moves, weak, node_limit)
    return score


def solve_with_nodes(moves: str, weak: bool = False, node_limit: int = 0):
    lib = _load()
    nodes = ctypes.c_longlong(0)
    score = lib.c4_solve_limited(moves.encode(), int(weak),
                                 int(node_limit), ctypes.byref(nodes))
    if score == ABORTED:
        raise BudgetExceeded(moves)
    return (None if score == INVALID else score), int(nodes.value)


def move_values(moves: str, weak: bool = False,
                node_limit: int = 0) -> List[Optional[int]]:
    """Value of each column for the player to move (None = illegal).

    ``v[c]`` uses the same score convention as :func:`solve`; an immediately
    winning move gets the exact fastest-win score.  ``node_limit`` is a
    per-column budget; exceeding it raises :class:`BudgetExceeded`.
    """
    lib = _load()
    out = (ctypes.c_int * 7)()
    lib.c4_solve_moves_limited(moves.encode(), int(weak), int(node_limit),
                               out)
    vals: List[Optional[int]] = []
    nmoves = len(moves)
    for c in range(7):
        v = out[c]
        if v == ABORTED:
            raise BudgetExceeded(f"{moves} column {c}")
        if v == INVALID:
            vals.append(None)
        elif v == IMMEDIATE_WIN:
            vals.append((42 + 1 - nmoves) // 2)  # win with the next stone
        else:
            vals.append(-v)
    return vals


def optimal_moves(moves: str, weak: bool = False) -> List[int]:
    """Columns achieving the best achievable value."""
    vals = move_values(moves, weak)
    best = max(v for v in vals if v is not None)
    return [c for c, v in enumerate(vals) if v is not None and v == best]
