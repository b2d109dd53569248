"""Tictactoe as a pure-JAX vectorizable environment.

Re-implements the rules of ``/root/reference/games/tictactoe/game.jl`` in the
TPU-native :class:`~alphazero_tpu.envs.core.Game` interface: the mutable
``GameEnv`` becomes an immutable ``NamedTuple`` of arrays and ``play!``
becomes a pure ``step``.

State encoding: ``board`` is ``int8[9]`` with 0=empty, 1=white, 2=black
(position ``p`` maps to ``(x, y) = (p % 3, p // 3)``); ``player`` is the
player to move.  Rewards are from white's POV: +1 white win, -1 black win,
0 draw (``games/tictactoe/game.jl:75-87``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .core import Game, WHITE

N = 3
NUM_CELLS = 9


def _alignments() -> np.ndarray:
    """The 8 winning lines (``games/tictactoe/game.jl:43-51``)."""
    lines = []
    for i in range(N):
        lines.append([i * N + j for j in range(N)])      # rows
        lines.append([j * N + i for j in range(N)])      # cols
    lines.append([i * N + i for i in range(N)])          # diag
    lines.append([i * N + (N - 1 - i) for i in range(N)])  # anti-diag
    return np.asarray(lines, np.int32)


ALIGNMENTS = np.asarray(_alignments())


def _dihedral_perms() -> np.ndarray:
    """The 7 non-identity dihedral symmetries as position permutations
    (``games/tictactoe/game.jl:149-162``): new_board[i] = board[perm[i]]."""
    def xy(p):
        return p % N, p // N

    def pos(x, y):
        return y * N + x

    def rot(x, y):  # 90° rotation
        return y, N - 1 - x

    def flip(x, y):  # flip along vertical axis
        return x, N - 1 - y

    def perm_of(f):
        return [pos(*f(*xy(p))) for p in range(NUM_CELLS)]

    def compose(f, g):
        return lambda x, y: f(*g(x, y))

    rot2, rot3 = compose(rot, rot), compose(rot, compose(rot, rot))
    fs = [rot, rot2, rot3, flip, compose(flip, rot), compose(flip, rot2),
          compose(flip, rot3)]
    return np.asarray([perm_of(f) for f in fs], np.int32)


SYM_PERMS = np.asarray(_dihedral_perms())


class TTTState(NamedTuple):
    board: jnp.ndarray   # int8[9], 0 empty / 1 white / 2 black
    player: jnp.ndarray  # int32, player to move
    done: jnp.ndarray    # bool
    rew: jnp.ndarray     # f32, white reward of last transition


def _init() -> TTTState:
    return TTTState(
        board=jnp.zeros((NUM_CELLS,), jnp.int8),
        player=jnp.asarray(WHITE, jnp.int32),
        done=jnp.asarray(False),
        rew=jnp.asarray(0.0, jnp.float32),
    )


def _has_won(board, mover_cell):
    lines = board[ALIGNMENTS]  # [8, 3]
    return jnp.any(jnp.all(lines == mover_cell, axis=-1))


def _step(s: TTTState, action, key) -> TTTState:
    del key  # deterministic game
    mover = s.player
    mover_cell = (mover + 1).astype(jnp.int8)
    # select, not scatter: batched int8 scatters miscompile on TPU at
    # >= 1024 lanes (see envs/connect_four.py:_step / repro_i8_scatter.py)
    board = jnp.where(jnp.arange(NUM_CELLS) == action, mover_cell, s.board)
    win = _has_won(board, mover_cell)
    full = jnp.all(board != 0)
    rew = jnp.where(win, jnp.where(mover == WHITE, 1.0, -1.0), 0.0)
    return TTTState(
        board=board,
        player=1 - mover,
        done=win | full,
        rew=rew.astype(jnp.float32),
    )


def _legal_mask(s: TTTState):
    return s.board == 0


def _observe(s: TTTState):
    """3x3x3 one-hot, current-player POV (``games/tictactoe/game.jl:136-143``):
    channels = (empty, current player's stones, opponent's stones)."""
    b = s.board.astype(jnp.int32)
    flipped = jnp.where(b == 0, 0, 3 - b)  # swap colors 1<->2
    b = jnp.where(s.player == WHITE, b, flipped)
    obs = jax.nn.one_hot(b, 3, dtype=jnp.float32)  # [9, 3]
    return obs.reshape(N, N, 3)


def _canonical_key(s: TTTState):
    return core.pack_base3(s.board, [s.player])


def _heuristic_value(s: TTTState):
    """Alignment-count heuristic (``games/tictactoe/game.jl:98-120``)."""
    gamma = 0.3

    def value_for(cell):
        lines = s.board[ALIGNMENTS]
        cnt = jnp.sum(lines == cell, axis=-1).astype(jnp.float32)
        blocked = jnp.any((lines != cell) & (lines != 0), axis=-1)
        return jnp.sum(jnp.where(blocked, 0.0, gamma ** (N - 1 - cnt)))

    mine = (s.player + 1).astype(jnp.int8)
    yours = (2 - s.player).astype(jnp.int8)
    return value_for(mine) - value_for(yours)


def _symmetrize(s: TTTState, pi):
    """All 7 dihedral images with permuted policies
    (``games/tictactoe/game.jl:164-168``)."""
    boards = s.board[SYM_PERMS]            # [7, 9]
    pis = pi[SYM_PERMS]                    # [7, 9]
    rep = lambda x: jnp.broadcast_to(x, (SYM_PERMS.shape[0],) + x.shape)
    return (TTTState(board=boards, player=rep(s.player), done=rep(s.done),
                     rew=rep(s.rew)), pis)


def _random_symmetry(s: TTTState, key):
    k = jax.random.randint(key, (), 0, SYM_PERMS.shape[0])
    return s._replace(board=s.board[jnp.asarray(SYM_PERMS)[k]])


def _render(s) -> str:
    board = np.asarray(s.board)
    marks = {0: ".", 1: "o", 2: "x"}
    rows = []
    for y in range(N):
        rows.append(" ".join(marks[int(board[y * N + x])] for x in range(N)))
    who = "Red(o)" if int(s.player) == WHITE else "Blue(x)"
    return f"{who} plays:\n" + "\n".join(rows)


def _action_string(a: int) -> str:
    return chr(ord("A") + a)


def _parse_action(txt: str):
    txt = txt.strip().upper()
    if len(txt) != 1:
        return None
    a = ord(txt) - ord("A")
    return a if 0 <= a < NUM_CELLS else None


def _read_state(txt: str):
    """Parse a board description (``GI.read_state``,
    ``games/tictactoe/game.jl:169-186``): 9 cells over ``.ox`` in row-major
    order, whitespace ignored (e.g. ``"ox. .o. ..x"``); the player to move
    is inferred from the stone counts (white = ``o`` moves first)."""
    cells = [c for c in txt.lower() if c in ".ox_-"]
    if len(cells) != NUM_CELLS:
        return None
    marks = {".": 0, "_": 0, "-": 0, "o": 1, "x": 2}
    board = np.asarray([marks[c] for c in cells], np.int8)
    n_o, n_x = int((board == 1).sum()), int((board == 2).sum())
    if n_o - n_x not in (0, 1):
        return None
    player = WHITE if n_o == n_x else 1 - WHITE
    won_o = bool(np.asarray(_has_won(jnp.asarray(board), jnp.int8(1))))
    won_x = bool(np.asarray(_has_won(jnp.asarray(board), jnp.int8(2))))
    if won_o and won_x:
        return None
    rew = 1.0 if won_o else (-1.0 if won_x else 0.0)
    done = won_o or won_x or bool((board != 0).all())
    return TTTState(board=jnp.asarray(board),
                    player=jnp.asarray(player, jnp.int32),
                    done=jnp.asarray(done),
                    rew=jnp.asarray(rew, jnp.float32))


GAME = Game(
    name="tictactoe",
    num_actions=NUM_CELLS,
    obs_shape=(N, N, 3),
    two_players=True,
    max_game_length=NUM_CELLS,
    key_size=2,
    num_symmetries=SYM_PERMS.shape[0],
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
