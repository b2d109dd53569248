"""Connect-four as a pure-JAX vectorizable environment.

Re-implements the rules of ``/root/reference/games/connect-four/game.jl`` in
the TPU-native :class:`~alphazero_tpu.envs.core.Game` interface.

State encoding: ``board`` is ``int8[6, 7]`` (row 0 = bottom), 0=empty,
1=white, 2=black.  Actions are columns 0..6.  Win detection and the minmax
heuristic both operate on the static table of all 69 four-in-a-row windows —
fully vectorized gathers, no scalar loops (the reference walks the board with
while-loops, ``games/connect-four/game.jl:87-127``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .core import Game, WHITE

NUM_ROWS = 6
NUM_COLS = 7
TO_CONNECT = 4


def _windows() -> np.ndarray:
    """All four-in-a-row windows as cell indices [69, 4, 2] (row, col).

    Equivalent to the reference's ``ALIGNMENTS`` table
    (``games/connect-four/game.jl:187-196``).
    """
    wins = []
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        for r in range(NUM_ROWS):
            for c in range(NUM_COLS):
                cells = [(r + i * dr, c + i * dc) for i in range(TO_CONNECT)]
                if all(0 <= rr < NUM_ROWS and 0 <= cc < NUM_COLS
                       for rr, cc in cells):
                    wins.append(cells)
    return np.asarray(wins, np.int32)


WINDOWS = np.asarray(_windows())  # [69, 4, 2] (numpy: no backend init at import)
_WROWS, _WCOLS = WINDOWS[..., 0], WINDOWS[..., 1]


class C4State(NamedTuple):
    board: jnp.ndarray   # int8[6, 7], 0 empty / 1 white / 2 black
    player: jnp.ndarray  # int32, player to move
    done: jnp.ndarray    # bool
    rew: jnp.ndarray     # f32, white reward of last transition


def _init() -> C4State:
    return C4State(
        board=jnp.zeros((NUM_ROWS, NUM_COLS), jnp.int8),
        player=jnp.asarray(WHITE, jnp.int32),
        done=jnp.asarray(False),
        rew=jnp.asarray(0.0, jnp.float32),
    )


def _win_cells(board):
    return board[_WROWS, _WCOLS]  # [69, 4]


def _has_won(board, mover_cell):
    return jnp.any(jnp.all(_win_cells(board) == mover_cell, axis=-1))


def _step(s: C4State, action, key) -> C4State:
    del key
    mover = s.player
    mover_cell = (mover + 1).astype(jnp.int8)
    col = s.board[:, action]
    row = jnp.sum((col != 0).astype(jnp.int32))  # first free row in column
    # stone placement as a masked select, NOT a scatter: the batched int8
    # scatter (vmap of board.at[row, action].set) miscompiles on the TPU
    # at >= 1024 lanes — ~27% of updates silently dropped, bisected via
    # scripts/repro_i8_scatter.py (int32 scatters and this select are
    # correct at every size; <= 768 lanes was always correct)
    hit = ((jnp.arange(NUM_ROWS)[:, None] == row)
           & (jnp.arange(NUM_COLS)[None, :] == action))
    board = jnp.where(hit, mover_cell, s.board)
    win = _has_won(board, mover_cell)
    full = jnp.all(board != 0)
    rew = jnp.where(win, jnp.where(mover == WHITE, 1.0, -1.0), 0.0)
    return C4State(
        board=board,
        player=1 - mover,
        done=win | full,
        rew=rew.astype(jnp.float32),
    )


def _legal_mask(s: C4State):
    return s.board[NUM_ROWS - 1, :] == 0


def _observe(s: C4State):
    """6x7x3 one-hot, current-player POV
    (``games/connect-four/game.jl:234-241``)."""
    b = s.board.astype(jnp.int32)
    flipped = jnp.where(b == 0, 0, 3 - b)
    b = jnp.where(s.player == WHITE, b, flipped)
    return jax.nn.one_hot(b, 3, dtype=jnp.float32)  # [6, 7, 3]


def _canonical_key(s: C4State):
    return core.pack_base3(s.board, [s.player])


def _heuristic_value(s: C4State):
    """Alignment-counting heuristic (``games/connect-four/game.jl:198-220``):
    each window open for ``p`` (no opponent stone) contributes
    ``0.1 ** (3 - #own stones)``; value = mine - yours for the current player.
    """
    gamma = 0.1
    cells = _win_cells(s.board)  # [69, 4]

    def value_for(cell):
        cnt = jnp.sum(cells == cell, axis=-1).astype(jnp.float32)
        blocked = jnp.any((cells != cell) & (cells != 0), axis=-1)
        return jnp.sum(jnp.where(blocked, 0.0,
                                 gamma ** (TO_CONNECT - 1.0 - cnt)))

    mine = (s.player + 1).astype(jnp.int8)
    yours = (2 - s.player).astype(jnp.int8)
    return value_for(mine) - value_for(yours)


def _symmetrize(s: C4State, pi):
    """Single left-right mirror symmetry
    (``games/connect-four/game.jl:252-257``)."""
    boards = s.board[:, ::-1][None]  # [1, 6, 7]
    pis = pi[::-1][None]             # [1, 7]
    rep = lambda x: x[None]
    return (C4State(board=boards, player=rep(s.player), done=rep(s.done),
                    rew=rep(s.rew)), pis)


def _random_symmetry(s: C4State, key):
    del key  # only one symmetry
    return s._replace(board=s.board[:, ::-1])


def _render(s) -> str:
    board = np.asarray(s.board)
    marks = {0: ".", 1: "o", 2: "x"}
    rows = [" ".join(str(c + 1) for c in range(NUM_COLS))]
    for r in range(NUM_ROWS - 1, -1, -1):
        rows.append(" ".join(marks[int(board[r, c])] for c in range(NUM_COLS)))
    who = "Red(o)" if int(s.player) == WHITE else "Blue(x)"
    return f"{who} plays:\n" + "\n".join(rows)


def _action_string(a: int) -> str:
    return str(a + 1)


def _parse_action(txt: str):
    try:
        a = int(txt.strip()) - 1
    except ValueError:
        return None
    return a if 0 <= a < NUM_COLS else None


def _read_state(txt: str):
    """Parse a state from a move string ("4453": 1-based columns played from
    the empty board — the Pons benchmark / solver notation and the analogue
    of ``GI.read_state``, ``games/connect-four/game.jl:276-300``)."""
    txt = txt.strip()
    if not txt or any(c not in "1234567" for c in txt):
        return None
    s = _init()
    for c in txt:
        a = int(c) - 1
        if bool(s.done) or not bool(_legal_mask(s)[a]):
            return None
        s = _step(s, jnp.asarray(a), None)
    return s


GAME = Game(
    name="connect-four",
    num_actions=NUM_COLS,
    obs_shape=(NUM_ROWS, NUM_COLS, 3),
    two_players=True,
    max_game_length=NUM_ROWS * NUM_COLS,
    key_size=4,
    num_symmetries=1,
    init=_init,
    step=_step,
    observe=_observe,
    legal_mask=_legal_mask,
    terminated=lambda s: s.done,
    reward=lambda s: s.rew,
    to_play=lambda s: s.player,
    canonical_key=_canonical_key,
    heuristic_value=_heuristic_value,
    symmetrize=_symmetrize,
    random_symmetry=_random_symmetry,
    render=_render,
    action_string=_action_string,
    parse_action=_parse_action,
    read_state=_read_state,
)
