"""Mancala (Kalah 6x3) as a pure-JAX vectorizable environment.

Re-implements the rules of ``/root/reference/games/mancala/game.jl``: sowing,
last-seed capture, free turns and the endgame sweep.  The reference's scalar
sowing loop (``game.jl:149-152``) becomes a closed-form vectorized update:
every position on the 13-slot sowing ring (6 own houses → own store → 6
opponent houses, skipping the opponent store) receives
``(n - d) // 13 + 1`` seeds where ``d`` is its ring distance from the source
house — one fused arithmetic expression, no loops.

State: ``houses`` int8[2, 6] (``houses[p, i]`` = house ``i+1`` of player
``p``), ``stores`` int8[2], player-to-move, move counter.

Known reference bug deliberately fixed: ``flip_colors`` at
``games/mancala/game.jl:224-229`` reads ``INITIAL_BOARD`` instead of its
argument, so black-to-move observations are always the initial board; here
the intended semantics (swap the two players' rows) is implemented.

Divergence (documented): a ``MAX_PLIES`` cap forces ultra-long games to an
adjudicated end by store comparison (the reference has unbounded games; a
fixed-shape scan needs a bound).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .core import Game, WHITE

H = 6                     # houses per player
RING = 2 * H + 1          # sowing ring length (skips opponent store)
SEEDS_PER_HOUSE = 3
TOTAL_SEEDS = 2 * H * SEEDS_PER_HOUSE
MAX_PLIES = 120


class MancalaState(NamedTuple):
    houses: jnp.ndarray   # int8[2, 6]
    stores: jnp.ndarray   # int8[2]
    player: jnp.ndarray   # int32
    done: jnp.ndarray     # bool
    rew: jnp.ndarray      # f32
    plies: jnp.ndarray    # int32


def _init() -> MancalaState:
    return MancalaState(
        houses=jnp.full((2, H), SEEDS_PER_HOUSE, jnp.int8),
        stores=jnp.zeros((2,), jnp.int8),
        player=jnp.asarray(WHITE, jnp.int32),
        done=jnp.asarray(False),
        rew=jnp.asarray(0.0, jnp.float32),
        plies=jnp.asarray(0, jnp.int32),
    )


def _final_reward(stores):
    nw, nb = stores[0], stores[1]
    return jnp.where(nw > nb, 1.0, jnp.where(nw < nb, -1.0, 0.0)
                     ).astype(jnp.float32)


def _step(s: MancalaState, action, key) -> MancalaState:
    del key
    p = s.player
    o = 1 - p
    houses = s.houses.astype(jnp.int32)
    stores = s.stores.astype(jnp.int32)
    n = houses[p, action]
    houses = houses.at[p, action].set(0)

    # --- sowing: ring slots j: 0..5 own houses (numbers 6..1 -> idx 5-j),
    # 6 own store, 7..12 opponent houses (idx 12-j).  The source house
    # ``action`` (0-based idx) sits at slot 5 - action.
    start = 5 - action
    j = jnp.arange(RING)
    d = jnp.mod(j - start - 1, RING) + 1          # ring distance 1..13
    seeds = jnp.where(d <= n, (n - d) // RING + 1, 0)
    own_slot_idx = 5 - j[:H]                       # slots 0..5 -> own house idx
    houses = houses.at[p, own_slot_idx].add(seeds[:H])
    stores = stores.at[p].add(seeds[H])
    opp_slot_idx = 12 - j[H + 1:]                  # slots 7..12 -> opp house idx
    houses = houses.at[o, opp_slot_idx].add(seeds[H + 1:])
    last = jnp.mod(start + n, RING)

    # --- endgame sweep helper (``game.jl:136-141``)
    def sweep(houses, stores, winner):
        stores = stores.at[winner].add(jnp.sum(houses[winner]))
        return houses.at[winner].set(0), stores

    own_empty = jnp.sum(houses[p]) == 0
    # branch 1: mover emptied their side -> opponent sweeps (``game.jl:154-156``)
    h1, s1 = sweep(houses, stores, o)

    # branch 2: last seed in a house (``game.jl:157-175``)
    last_own_idx = jnp.clip(5 - last, 0, H - 1)
    capture = (last < H) & (houses[p, last_own_idx] == 1)
    opp_idx = H - 1 - last_own_idx
    cap_amount = houses[p, last_own_idx] + houses[o, opp_idx]
    h2 = jnp.where(capture,
                   houses.at[p, last_own_idx].set(0).at[o, opp_idx].set(0),
                   houses)
    s2 = jnp.where(capture, stores.at[p].add(cap_amount), stores)
    opp_now_empty = jnp.sum(h2[o]) == 0
    own_now_empty = jnp.sum(h2[p]) == 0
    h2a, s2a = sweep(h2, s2, p)   # opponent emptied by capture
    h2b, s2b = sweep(h2, s2, o)   # own side emptied by capture
    ended2 = capture & (opp_now_empty | own_now_empty)
    h2f = jnp.where(capture & opp_now_empty, h2a,
                    jnp.where(capture & own_now_empty, h2b, h2))
    s2f = jnp.where(capture & opp_now_empty, s2a,
                    jnp.where(capture & own_now_empty, s2b, s2))

    is_house = last != H
    free_turn = ~is_house

    houses_f = jnp.where(own_empty, h1, jnp.where(is_house, h2f, houses))
    stores_f = jnp.where(own_empty, s1, jnp.where(is_house, s2f, stores))
    done = own_empty | (is_house & ended2)
    # forced adjudication at the ply cap (TPU divergence, see module doc)
    plies = s.plies + 1
    capped = (plies >= MAX_PLIES) & ~done
    done = done | capped
    next_player = jnp.where(done | free_turn, p, o)
    rew = jnp.where(done, _final_reward(stores_f), 0.0)
    return MancalaState(
        houses=houses_f.astype(jnp.int8),
        stores=stores_f.astype(jnp.int8),
        player=next_player,
        done=done,
        rew=rew,
        plies=plies,
    )


def _legal_mask(s: MancalaState):
    return s.houses[s.player] > 0


def _observe(s: MancalaState):
    """14x1x5 tensor (``game.jl:231-257``), current-player POV: positions
    [own houses 6..1, own store, opp houses 6..1, opp store]; channels
    (nstones, own-house, own-store, opp-house, opp-store)."""
    p = s.player
    o = 1 - p
    own_h = s.houses[p][::-1].astype(jnp.float32)   # houses 6..1
    opp_h = s.houses[o][::-1].astype(jnp.float32)
    nstones = jnp.concatenate([
        own_h, s.stores[p][None].astype(jnp.float32),
        opp_h, s.stores[o][None].astype(jnp.float32)])
    whouse = jnp.asarray([1.0] * H + [0.0] + [0.0] * H + [0.0])
    wstore = jnp.asarray([0.0] * H + [1.0] + [0.0] * H + [0.0])
    bhouse = jnp.asarray([0.0] * H + [0.0] + [1.0] * H + [0.0])
    bstore = jnp.asarray([0.0] * H + [0.0] + [0.0] * H + [1.0])
    obs = jnp.stack([nstones, whouse, wstore, bhouse, bstore], axis=-1)
    return obs[:, None, :]  # [14, 1, 5]


def _canonical_key(s: MancalaState):
    """Pack 14 cells (values <= 36 < 64) base-64, 5 per word, + player."""
    cells = jnp.concatenate(
        [s.houses.reshape(-1), s.stores]).astype(jnp.int32)
    words = []
    for start in range(0, 14, 5):
        chunk = cells[start:start + 5]
        w = jnp.zeros((), jnp.int32)
        for i in range(chunk.shape[0]):
            w = w * 64 + chunk[i]
        words.append(w)
    words.append(s.player)
    return jnp.stack(words)


def _heuristic_value(s: MancalaState):
    """Store difference, current-player POV (``game.jl:213-218``)."""
    v = (s.stores[0] - s.stores[1]).astype(jnp.float32)
    return jnp.where(s.player == WHITE, v, -v)


def _render(s) -> str:
    h = np.asarray(s.houses)
    st = np.asarray(s.stores)
    top = " ".join(f"{int(x):2d}" for x in h[1][::-1])
    bot = " ".join(f"{int(x):2d}" for x in h[0])
    who = "White(1)" if int(s.player) == WHITE else "Black(2)"
    return (f"{who} to move\n"
            f"      {top}\n"
            f"[{int(st[1]):2d}]                    [{int(st[0]):2d}]\n"
            f"      {bot}\n"
            f"   (white houses 1..6 left-to-right)")


GAME = Game(
    name="mancala",
    num_actions=H,
    obs_shape=(2 * H + 2, 1, 5),
    two_players=True,
    max_game_length=MAX_PLIES,
    key_size=4,
    num_symmetries=0,
    init=_init,
    step=_step,
    observe=_observe,
    legal_mask=_legal_mask,
    terminated=lambda s: s.done,
    reward=lambda s: s.rew,
    to_play=lambda s: s.player,
    canonical_key=_canonical_key,
    heuristic_value=_heuristic_value,
    symmetrize=None,
    random_symmetry=None,
    render=_render,
    action_string=lambda a: str(a + 1),
    parse_action=lambda txt: (int(txt) - 1
                              if txt.strip().isdigit()
                              and 1 <= int(txt) <= H else None),
)
