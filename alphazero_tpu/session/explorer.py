"""Interactive explorer: a REPL debugger for trained agents.

Re-design of ``/root/reference/src/ui/explorer.jl``: renders the current
state, cross-references the network, a fresh MCTS search and the replay
memory for every available action (columns ``Pnet Vnet Pmcts Qmcts Nmcts
Pmem Vmem Nmem``), and accepts the commands of ``explorer.jl:192-250``:

    do <action>   play an action (or sample from the agent with no arg)
    explore       run the agent's search again on this state
    undo          undo the last action
    restart       back to the initial state
    <action>      shorthand for ``do <action>``
    quit
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import arena as arenamod
from .. import memory as memmod
from ..config import MctsParams
from ..envs.core import Game
from ..models.interface import NetState, Network, NetworkSpec
from ..search import mcts


class Explorer:
    """(``explorer.jl:167-189``)"""

    def __init__(self, game: Game, netspec: NetworkSpec, net: NetState,
                 mcts_params: MctsParams,
                 replay: Optional[memmod.Replay] = None):
        self.game = game
        self.network = Network(game, netspec)
        self.net = net
        self.params = mcts_params
        self.replay = replay
        self.history: List = []
        self.state = game.init()
        cfg = arenamod.mcts_config(mcts_params)

        def _search(s1, key):
            def oracle(states, obs, mask):
                p, _, v, _ = self.network.forward_normalized(net, obs, mask)
                return p, v
            return arenamod.run_search(game, oracle, s1, key, cfg)

        self._search = jax.jit(_search)
        self._rng = jax.random.key(1234)

    def _key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _batch1(self):
        return jax.tree.map(lambda x: x[None], self.state)

    def state_statistics(self):
        """Per-action table (``explorer.jl:62-116``)."""
        g, s = self.game, self.state
        mask = np.asarray(g.legal_mask(s))
        obs = jnp.asarray(g.observe(s))[None]
        pnet, _, vnet, _ = self.network.forward_normalized(
            self.net, obs, jnp.asarray(mask)[None])
        res = self._search(self._batch1(), self._key())
        rows = []
        mem_pi, mem_v, mem_n = None, None, 0
        if self.replay is not None and int(self.replay.size) > 0:
            key = np.asarray(g.canonical_key(s))
            size = int(self.replay.size)
            keys = np.asarray(self.replay.key[:size])
            hits = (keys == key).all(-1)
            if hits.any():
                mem_n = int(hits.sum())
                mem_pi = np.asarray(self.replay.pi[:size][hits]).mean(0)
                mem_v = float(np.asarray(self.replay.z[:size][hits]).mean())
        for a in np.flatnonzero(mask):
            row = {
                "action": g.action_string(int(a)) if g.action_string else a,
                "Pnet": float(pnet[0, a]),
                "Pmcts": float(res.policy[0, a]),
                "Qmcts": float(res.root_q[0, a]),
                "Nmcts": int(res.root_visits[0, a]),
            }
            if mem_pi is not None:
                row["Pmem"] = float(mem_pi[a])
            rows.append(row)
        info = {
            "Vnet": float(vnet[0]),
            "Vmem": mem_v,
            "Nmem": mem_n,
            "player": int(g.to_play(s)),
            "terminated": bool(g.terminated(s)),
        }
        return rows, info

    def do_action(self, a: int):
        self.history.append(self.state)
        self.state = self.game.step(self.state, jnp.asarray(a), self._key())

    def undo(self):
        if self.history:
            self.state = self.history.pop()

    def restart(self):
        self.history = []
        self.state = self.game.init()

    def agent_move(self) -> int:
        res = self._search(self._batch1(), self._key())
        return int(np.argmax(np.asarray(res.policy)[0]))

    def repl(self, input_fn=input, print_fn=print):
        """(``start_explorer``, ``explorer.jl:252-268``)"""
        g = self.game
        while True:
            print_fn(g.render(self.state) if g.render else str(self.state))
            if bool(g.terminated(self.state)):
                print_fn(f"Game over. White reward: "
                         f"{float(g.reward(self.state))}")
            else:
                rows, info = self.state_statistics()
                hdr = list(rows[0].keys()) if rows else []
                print_fn("  ".join(f"{h:>8}" for h in hdr))
                for r in rows:
                    print_fn("  ".join(
                        f"{v:8.3f}" if isinstance(v, float) else f"{v:>8}"
                        for v in r.values()))
                print_fn(f"Vnet={info['Vnet']:+.3f}  Nmem={info['Nmem']}" +
                         (f"  Vmem={info['Vmem']:+.3f}"
                          if info["Vmem"] is not None else ""))
            try:
                cmd = input_fn("explorer> ").strip()
            except (EOFError, KeyboardInterrupt):
                return
            if cmd in ("quit", "q", "exit"):
                return
            if cmd == "undo":
                self.undo()
            elif cmd == "restart":
                self.restart()
            elif cmd in ("do", "explore", ""):
                if bool(g.terminated(self.state)):
                    continue
                if cmd == "explore":
                    continue  # stats recomputed on next loop
                self.do_action(self.agent_move())
            else:
                arg = cmd[3:].strip() if cmd.startswith("do ") else cmd
                a = g.parse_action(arg) if g.parse_action else None
                if a is None or not bool(g.legal_mask(self.state)[a]):
                    print_fn(f"invalid action: {arg}")
                else:
                    self.do_action(int(a))


def interactive_play(game: Game, netspec=None, net=None, mcts_params=None,
                     human_white=True, input_fn=input, print_fn=print):
    """Human-vs-agent terminal play (``src/play.jl:329-379``)."""
    import jax.random as jr
    state = game.init()
    rng = jr.key(0)
    explorer = None
    if net is not None:
        explorer = Explorer(game, netspec, net, mcts_params)
    turn = 0
    while not bool(game.terminated(state)):
        print_fn(game.render(state))
        white_to_play = int(game.to_play(state)) == 0
        if explorer is None or white_to_play == human_white:
            a = None
            while a is None:
                try:
                    txt = input_fn("> ")
                except (EOFError, KeyboardInterrupt):
                    return
                a = game.parse_action(txt)
                if a is not None and not bool(game.legal_mask(state)[a]):
                    a = None
        else:
            explorer.state = state
            a = explorer.agent_move()
            print_fn(f"agent plays {game.action_string(a)}")
        rng, k = jr.split(rng)
        state = game.step(state, jnp.asarray(a), k)
        turn += 1
    print_fn(game.render(state))
    print_fn(f"White reward: {float(game.reward(state))}")
