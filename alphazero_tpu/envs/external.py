"""Bridges for external (host-python) game environments.

Re-design of the reference's two bridge layers:

* ``src/common_rl_intf.jl`` (CommonRLInterface wrapper)
* ``src/openspiel.jl`` (OpenSpiel C++ games via CxxWrap)

A host environment cannot run inside a jitted TPU program, so the TPU-native
bridge *tabulates* it: the reachable state space is enumerated once on the
host (BFS) and compiled into transition/legality/reward/observation tensors;
the resulting :class:`~alphazero_tpu.envs.core.Game` steps via pure gathers —
fully jittable, batchable and fast.  This covers the reference's bridge use
cases (small/medium games like OpenSpiel tictactoe,
``src/openspiel_example.jl``); games too large to tabulate must be written
natively against the Game interface (as the four in-repo games are).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Hashable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Game, WHITE


@dataclasses.dataclass
class HostGame:
    """A scalar, host-side game definition (CommonRL-style).

    - ``initial_state() -> state`` (hashable)
    - ``legal_actions(state) -> list[int]``
    - ``apply(state, a) -> (next_state, white_reward)``
    - ``terminated(state) -> bool``
    - ``to_play(state) -> int`` (0 white / 1 black)
    - ``observe(state) -> np.ndarray`` (current-player POV, float32)
    """

    name: str
    num_actions: int
    obs_shape: Tuple[int, ...]
    two_players: bool
    max_game_length: int
    initial_state: Callable[[], Hashable]
    legal_actions: Callable[[Hashable], List[int]]
    apply: Callable[[Hashable, int], Tuple[Hashable, float]]
    terminated: Callable[[Hashable], bool]
    to_play: Callable[[Hashable], int]
    observe: Callable[[Hashable], np.ndarray]
    render: Optional[Callable[[Hashable], str]] = None
    action_string: Optional[Callable[[int], str]] = None
    parse_action: Optional[Callable[[str], Optional[int]]] = None


class TabState(NamedTuple):
    idx: jnp.ndarray   # i32 state index into the tables
    rew: jnp.ndarray   # f32 white reward of the last transition


def tabulate(host: HostGame, max_states: int = 2_000_000) -> Game:
    """Enumerate the reachable state space and build a tensorized Game."""
    index = {}
    states: List[Hashable] = []

    def intern(s) -> int:
        if s not in index:
            index[s] = len(states)
            states.append(s)
        return index[s]

    s0 = host.initial_state()
    intern(s0)
    queue = deque([s0])
    trans_rows, rew_rows = [], []
    while queue:
        s = queue.popleft()
        i = index[s]
        while len(trans_rows) <= i:
            trans_rows.append(None)
            rew_rows.append(None)
        row = np.full(host.num_actions, i, np.int32)
        rrow = np.zeros(host.num_actions, np.float32)
        if not host.terminated(s):
            for a in host.legal_actions(s):
                nxt, r = host.apply(s, a)
                known = nxt in index
                j = intern(nxt)
                if len(states) > max_states:
                    raise ValueError(
                        f"state space of {host.name} exceeds {max_states}; "
                        "write it natively against the Game interface")
                row[a] = j
                rrow[a] = r
                if not known:
                    queue.append(nxt)
        trans_rows[i] = row
        rew_rows[i] = rrow
    n = len(states)
    trans = jnp.asarray(np.stack(trans_rows))              # [n, A]
    step_rew = jnp.asarray(np.stack(rew_rows))             # [n, A]
    legal_np = np.zeros((n, host.num_actions), bool)
    term_np = np.zeros((n,), bool)
    player_np = np.zeros((n,), np.int32)
    obs_np = np.zeros((n,) + host.obs_shape, np.float32)
    for s, i in index.items():
        term_np[i] = host.terminated(s)
        player_np[i] = host.to_play(s)
        obs_np[i] = host.observe(s)
        if not term_np[i]:
            legal_np[i, host.legal_actions(s)] = True
    legal = jnp.asarray(legal_np)
    term = jnp.asarray(term_np)
    player = jnp.asarray(player_np)
    obs = jnp.asarray(obs_np)
    host_states = states  # python list, host-side rendering only

    def _init() -> TabState:
        return TabState(idx=jnp.asarray(0, jnp.int32),
                        rew=jnp.asarray(0.0, jnp.float32))

    def _step(s: TabState, action, key) -> TabState:
        del key
        return TabState(idx=trans[s.idx, action],
                        rew=step_rew[s.idx, action])

    return Game(
        name=host.name,
        num_actions=host.num_actions,
        obs_shape=host.obs_shape,
        two_players=host.two_players,
        max_game_length=host.max_game_length,
        key_size=1,
        num_symmetries=0,
        init=_init,
        step=_step,
        observe=lambda s: obs[s.idx],
        legal_mask=lambda s: legal[s.idx],
        terminated=lambda s: term[s.idx],
        reward=lambda s: s.rew,
        to_play=lambda s: player[s.idx],
        canonical_key=lambda s: s.idx[None].astype(jnp.int32),
        heuristic_value=lambda s: jnp.asarray(0.0, jnp.float32),
        render=(lambda s: host.render(host_states[int(s.idx)]))
        if host.render else None,
        action_string=host.action_string,
        parse_action=host.parse_action,
    )


def openspiel_host_game(name: str) -> HostGame:
    """Wrap an OpenSpiel game as a HostGame (``src/openspiel.jl:7-60``).

    Requires ``pyspiel``; raises ImportError when unavailable (the reference
    similarly loads its OpenSpiel wrapper lazily, ``src/AlphaZero.jl:180-188``).
    """
    import pyspiel  # noqa: deferred optional dependency

    g = pyspiel.load_game(name)
    if g.num_players() != 2:
        raise ValueError("only 2-player OpenSpiel games are supported here")
    shape = tuple(g.observation_tensor_shape())
    if len(shape) == 3:
        obs_shape = (shape[1], shape[2], shape[0])  # CHW -> HWC
    else:
        obs_shape = (int(np.prod(shape)), 1, 1)

    class Key:
        """Hashable wrapper around an OpenSpiel state (history-keyed)."""

        __slots__ = ("st", "hist")

        def __init__(self, st):
            self.st = st
            self.hist = tuple(st.history())

        def __hash__(self):
            return hash(self.hist)

        def __eq__(self, other):
            return self.hist == other.hist

    def observe(k: Key):
        st = k.st
        player = st.current_player() if not st.is_terminal() else 0
        t = np.asarray(st.observation_tensor(max(player, 0)), np.float32)
        if len(shape) == 3:
            return t.reshape(shape).transpose(1, 2, 0)
        return t.reshape(obs_shape)

    def apply(k: Key, a: int):
        st = k.st.clone()
        st.apply_action(a)
        r = st.returns()[0] if st.is_terminal() else 0.0
        return Key(st), float(r)

    return HostGame(
        name=f"openspiel:{name}",
        num_actions=g.num_distinct_actions(),
        obs_shape=obs_shape,
        two_players=True,
        max_game_length=int(g.max_game_length()),
        initial_state=lambda: Key(g.new_initial_state()),
        legal_actions=lambda k: list(k.st.legal_actions()),
        apply=apply,
        terminated=lambda k: k.st.is_terminal(),
        to_play=lambda k: max(int(k.st.current_player()), 0),
        observe=observe,
        render=lambda k: str(k.st),
        action_string=str,
    )


def openspiel_game(name: str, max_states: int = 2_000_000) -> Game:
    """OpenSpiel game as a jittable tabulated Game."""
    return tabulate(openspiel_host_game(name), max_states=max_states)
