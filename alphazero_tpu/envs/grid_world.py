"""Grid-world: a single-player stochastic MDP.

Re-implements ``/root/reference/games/grid-world/game.jl`` (which reaches the
framework through the CommonRL bridge; here the native Game interface covers
one-player MDPs directly, playing the role of ``src/common_rl_intf.jl``).

10x10 grid; four terminal reward cells (+10 at (9,3), +3 at (8,8), -10 at
(4,3), -5 at (4,6), 1-based coords); moves right/left/up/down with a 40%
chance of a uniformly random direction instead (``game.jl:43-51``); positions
clamp at the borders; episodes are capped at 200 steps (``game.jl:14``).
Start position is uniformly random — the ``init_random`` hook.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Game, WHITE

SIZE = 10
EPISODE_LENGTH_BOUND = 200

# (x, y) 0-based, reward (``game.jl:24-28``)
REWARD_CELLS = np.asarray([[8, 2], [7, 7], [3, 2], [3, 5]], np.int32)
REWARD_VALUES = np.asarray([10.0, 3.0, -10.0, -5.0], np.float32)

# actions: right, left, up, down (``game.jl:37``)
MOVES = np.asarray([[1, 0], [-1, 0], [0, 1], [0, -1]], np.int32)
_RCELLS = np.asarray(REWARD_CELLS)
_RVALS = np.asarray(REWARD_VALUES)


class GridState(NamedTuple):
    pos: jnp.ndarray    # int32[2] (x, y), 0-based
    time: jnp.ndarray   # int32
    done: jnp.ndarray   # bool
    rew: jnp.ndarray    # f32


def _cell_reward(pos):
    hit = jnp.all(_RCELLS == pos[None, :], axis=-1)
    return jnp.sum(jnp.where(hit, _RVALS, 0.0)), jnp.any(hit)


def _init() -> GridState:
    return GridState(pos=jnp.zeros((2,), jnp.int32),
                     time=jnp.asarray(0, jnp.int32),
                     done=jnp.asarray(False),
                     rew=jnp.asarray(0.0, jnp.float32))


def _init_random(key) -> GridState:
    pos = jax.random.randint(key, (2,), 0, SIZE)
    _, on_reward = _cell_reward(pos)
    return GridState(pos=pos, time=jnp.asarray(0, jnp.int32),
                     done=on_reward, rew=jnp.asarray(0.0, jnp.float32))


def _step(s: GridState, action, key) -> GridState:
    k1, k2 = jax.random.split(key)
    random_a = jax.random.randint(k2, (), 0, 4)
    a = jnp.where(jax.random.uniform(k1) < 0.4, random_a, action)
    pos = jnp.clip(s.pos + jnp.asarray(MOVES)[a], 0, SIZE - 1)
    r, on_reward = _cell_reward(pos)
    time = s.time + 1
    return GridState(pos=pos, time=time,
                     done=on_reward | (time > EPISODE_LENGTH_BOUND),
                     rew=r.astype(jnp.float32))


def _observe(s: GridState):
    # select, not scatter (batched per-lane scatters miscompile on TPU at
    # large lane counts; see envs/connect_four.py:_step)
    obs = ((jnp.arange(SIZE)[:, None] == s.pos[0])
           & (jnp.arange(SIZE)[None, :] == s.pos[1])).astype(jnp.float32)
    return obs[:, :, None]


def _canonical_key(s: GridState):
    # position + elapsed time (time is part of our state because of the
    # episode cap; the reference excludes it from state identity and
    # acknowledges the resulting value bias, ``game.jl:11-14``)
    return jnp.stack([s.pos[0] * SIZE + s.pos[1], s.time]).astype(jnp.int32)


def _render(s) -> str:
    pos = np.asarray(s.pos)
    rows = []
    for y in range(SIZE - 1, -1, -1):
        row = []
        for x in range(SIZE):
            if (pos == [x, y]).all():
                row.append("+")
            else:
                r = 0.0
                for (cx, cy), v in zip(REWARD_CELLS, REWARD_VALUES):
                    if (cx, cy) == (x, y):
                        r = v
                row.append("o" if r > 0 else ("x" if r < 0 else "."))
        rows.append(" ".join(row))
    return "\n".join(rows)


ACTION_NAMES = ["r", "l", "u", "d"]

GAME = Game(
    name="grid-world",
    num_actions=4,
    obs_shape=(SIZE, SIZE, 1),
    two_players=False,
    max_game_length=EPISODE_LENGTH_BOUND + 1,
    key_size=2,
    num_symmetries=0,
    init=_init,
    init_random=_init_random,
    step=_step,
    observe=_observe,
    legal_mask=lambda s: jnp.ones((4,), bool),
    terminated=lambda s: s.done,
    reward=lambda s: s.rew,
    to_play=lambda s: jnp.asarray(WHITE, jnp.int32),
    canonical_key=_canonical_key,
    heuristic_value=lambda s: jnp.asarray(0.0, jnp.float32),
    symmetrize=None,
    random_symmetry=None,
    render=_render,
    action_string=lambda a: ACTION_NAMES[a],
    parse_action=lambda txt: (ACTION_NAMES.index(txt.strip())
                              if txt.strip() in ACTION_NAMES else None),
)
