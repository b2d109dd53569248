"""Interactive explorer: a REPL debugger for trained agents.

Re-design of ``/root/reference/src/ui/explorer.jl``: renders the current
state, cross-references the network, a fresh MCTS search and the replay
memory for every available action (the full reference column set
``P Pmem Pmcts Qmcts UCT Pnet Qnet`` per action plus ``Nmcts Nmem Vmem
Vnet``, ``explorer.jl:9-27``; rows sorted by ``P`` as ``explorer.jl:113``
does), and accepts the commands of ``explorer.jl:192-250``:

    do <action>   play an action (agent's best with no arg)
    explore [n]   re-run the search on this state ([n] simulations)
    go <state>    jump to a state (game-specific notation; ``read_state``)
    flip          apply a random board symmetry
    undo          undo the last action
    restart       back to the initial state
    <action>      shorthand for ``do <action>``
    quit
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import arena as arenamod
from .. import memory as memmod
from ..config import MctsParams
from ..envs import core as envcore
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
        self.turn = 0
        self._cfg = arenamod.mcts_config(mcts_params)
        self._rng = jax.random.key(1234)

    @functools.lru_cache(maxsize=8)
    def _search_prog(self, num_sims: int):
        cfg = dataclasses.replace(self._cfg, num_sims=num_sims)
        game, net, network = self.game, self.net, self.network

        def _search(s1, key):
            def oracle(states, obs, mask):
                p, _, v, _ = network.forward_normalized(net, obs, mask)
                return p, v
            return arenamod.run_search(game, oracle, s1, key, cfg)

        return jax.jit(_search)

    def _search(self, s1, key, num_sims: Optional[int] = None):
        return self._search_prog(num_sims or self._cfg.num_sims)(s1, key)

    def _key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _batch1(self):
        return jax.tree.map(lambda x: x[None], self.state)

    def _qnet(self, mask):
        """Per-action one-step net lookahead (``evaluate_qnet``,
        ``explorer.jl:42-52``): r + gamma * (+-)Vnet(child), from the
        current player's POV."""
        g, s = self.game, self.state
        A = g.num_actions
        acts = jnp.arange(A)
        keys = jax.random.split(self._key(), A)
        batch = jax.tree.map(lambda x: jnp.broadcast_to(
            x[None], (A,) + x.shape), s)
        children = jax.vmap(g.step)(batch, acts, keys)
        wr = jax.vmap(g.reward)(children)
        me = g.to_play(s)
        r = jnp.where(me == envcore.WHITE, wr, -wr)
        obs = jax.vmap(g.observe)(children)
        cmask = jax.vmap(g.legal_mask)(children)
        _, _, vnext, _ = self.network.forward_normalized(
            self.net, obs, cmask)
        term = jax.vmap(g.terminated)(children)
        vnext = jnp.where(term, 0.0, vnext)
        flip = jax.vmap(g.to_play)(children) != me
        vnext = jnp.where(flip, -vnext, vnext)
        gamma = self.params.gamma
        return np.asarray(jnp.where(jnp.asarray(mask), r + gamma * vnext,
                                    0.0))

    def state_statistics(self, num_sims: Optional[int] = None):
        """Per-action table (``explorer.jl:62-116``), sorted by P."""
        g, s = self.game, self.state
        mask = np.asarray(g.legal_mask(s))
        obs = jnp.asarray(g.observe(s))[None]
        pnet, _, vnet, _ = self.network.forward_normalized(
            self.net, obs, jnp.asarray(mask)[None])
        res = self._search(self._batch1(), self._key(), num_sims)
        # P: the think policy with the player's temperature applied
        # (``explorer.jl:66-73``)
        tau = self.params.temperature(self.turn)
        P = np.asarray(envcore.apply_temperature(res.policy, tau))[0]
        qnet = self._qnet(mask)
        # UCT scores at the root, without exploration noise
        # (``explorer.jl:76-87`` passes epsilon=0)
        visits = np.asarray(res.root_visits[0]).astype(np.float64)
        q = np.asarray(res.root_q[0])
        A = g.num_actions
        prior = np.asarray(res.tree.prior_legal[0, :A, :])[:, 0]
        cpuct = getattr(self._cfg, "cpuct", None)
        ucts = (q + cpuct * prior * np.sqrt(max(visits.sum(), 0.0))
                / (visits + 1.0)) if cpuct is not None else None
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
                "P": float(P[a]),
                "Pnet": float(pnet[0, a]),
                "Pmcts": float(res.policy[0, a]),
                "Qmcts": float(res.root_q[0, a]),
                "Qnet": float(qnet[a]),
                "Nmcts": int(res.root_visits[0, a]),
            }
            if ucts is not None:
                row["UCT"] = float(ucts[a])
            if mem_pi is not None:
                row["Pmem"] = float(mem_pi[a])
            rows.append(row)
        rows.sort(key=lambda r: -r["P"])
        info = {
            "Vnet": float(vnet[0]),
            "Vmem": mem_v,
            "Nmem": mem_n,
            "player": int(g.to_play(s)),
            "terminated": bool(g.terminated(s)),
        }
        return rows, info

    def do_action(self, a: int):
        self.history.append((self.state, self.turn))
        self.state = self.game.step(self.state, jnp.asarray(a), self._key())
        self.turn += 1

    def undo(self):
        if self.history:
            self.state, self.turn = self.history.pop()

    def restart(self):
        self.history = []
        self.state = self.game.init()
        self.turn = 0

    def go(self, txt: str) -> bool:
        """Jump to a described state (``explorer.jl:194-206``)."""
        if self.game.read_state is None:
            return False
        s = self.game.read_state(txt)
        if s is None:
            return False
        self.history.append((self.state, self.turn))
        self.state = s
        self.turn = 0
        return True

    def flip(self) -> bool:
        """Apply a random board symmetry (``explorer.jl:230-233``)."""
        if self.game.random_symmetry is None:
            return False
        self.history.append((self.state, self.turn))
        self.state = self.game.random_symmetry(self.state, self._key())
        return True

    def agent_move(self) -> int:
        res = self._search(self._batch1(), self._key())
        return int(np.argmax(np.asarray(res.policy)[0]))

    def repl(self, input_fn=input, print_fn=print):
        """(``start_explorer``, ``explorer.jl:252-268``)"""
        g = self.game
        explore_sims = None
        while True:
            print_fn(g.render(self.state) if g.render else str(self.state))
            if bool(g.terminated(self.state)):
                print_fn(f"Game over. White reward: "
                         f"{float(g.reward(self.state))}")
            else:
                rows, info = self.state_statistics(explore_sims)
                explore_sims = None
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
            word, _, arg = cmd.partition(" ")
            word, arg = word.lower(), arg.strip()
            if word in ("quit", "q", "exit"):
                return
            if word == "undo":
                self.undo()
            elif word == "restart":
                self.restart()
            elif word == "go":
                if not self.go(arg):
                    print_fn("Invalid state description.")
            elif word == "flip":
                if not self.flip():
                    print_fn("This game has no symmetries.")
            elif word == "explore":
                if arg:
                    try:
                        explore_sims = int(arg)
                    except ValueError:
                        print_fn(f"invalid simulation count: {arg}")
                continue  # stats recomputed on next loop
            elif word in ("do", ""):
                if bool(g.terminated(self.state)):
                    continue
                if not arg:
                    self.do_action(self.agent_move())
                    continue
                a = g.parse_action(arg) if g.parse_action else None
                if a is None or not bool(g.legal_mask(self.state)[a]):
                    print_fn(f"invalid action: {arg}")
                else:
                    self.do_action(int(a))
            else:
                a = g.parse_action(cmd) if g.parse_action else None
                if a is None or not bool(g.legal_mask(self.state)[a]):
                    print_fn(f"invalid action: {cmd}")
                else:
                    self.do_action(int(a))


def interactive_play(game: Game, netspec=None, net=None, mcts_params=None,
                     human_white=True, players=None,
                     input_fn=input, print_fn=print):
    """Interactive terminal play between ANY pairing of players, like the
    reference's ``GI.interactive!`` (``src/play.jl:329-379``), which plays
    any two players including two humans.

    ``players`` is an optional ``(white, black)`` pair of ``"human"`` /
    ``"agent"``; when omitted it defaults to the classic human-vs-agent
    arrangement per ``human_white`` (agent-only when no net is given,
    which also covers 1-player games driven by the agent).  Two humans
    need no network; agent-vs-agent replays a self-play game move by
    move.
    """
    import jax.random as jr
    if players is None:
        if net is None:
            players = ("human", "human")
        else:
            players = (("human", "agent") if human_white
                       else ("agent", "human"))
    if "agent" in players and net is None:
        raise ValueError("an 'agent' player needs a trained network")
    state = game.init()
    rng = jr.key(0)
    explorer = None
    if net is not None:
        explorer = Explorer(game, netspec, net, mcts_params)
    turn = 0
    labels = ("white", "black")
    while not bool(game.terminated(state)):
        print_fn(game.render(state))
        side = int(game.to_play(state))
        if players[side] == "human":
            a = None
            while a is None:
                try:
                    txt = input_fn(f"{labels[side]}> "
                                   if game.two_players else "> ")
                except (EOFError, KeyboardInterrupt):
                    return
                a = game.parse_action(txt)
                if a is not None and not bool(game.legal_mask(state)[a]):
                    a = None
        else:
            explorer.state = state
            a = explorer.agent_move()
            print_fn(f"agent ({labels[side]}) plays {game.action_string(a)}")
        rng, k = jr.split(rng)
        state = game.step(state, jnp.asarray(a), k)
        turn += 1
    print_fn(game.render(state))
    print_fn(f"White reward: {float(game.reward(state))}")
