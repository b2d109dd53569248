"""Probe: pi-target sharpness under the reference's EXACT search semantics.

Round-3's verdict left one load-bearing mystery (VERDICT item 7): at
iteration 1 — before any learning can differ — the reference's stored
pi-target entropy is ~1.29 (``docs/src/assets/img/connect-four/plots/
entropies.png``) while ours is 1.78 (``sessions/c4-flagship/reports/
iter_1.json``).  Same 600-sim budget, same cpuct/noise.  The two candidate
semantic differences are (a) the reference's tree is a TRANSPOSITION TABLE
keyed by state (``src/mcts.jl:124-151``: ``Dict{State,StateInfo}``), i.e. a
DAG that merges move-order transpositions, while our array tree is
path-structured; and (b) the reference PERSISTS that table across moves and
across ``reset_every=2`` games (``src/simulations.jl:235-237``), so later
roots inherit visits.

This script plays self-play connect-four games with a recursive
reference-faithful MCTS (uct/backprop semantics of ``src/mcts.jl:180-245``:
Q = W/max(N,1), root Dirichlet noise per ``explore!`` drawn over legal
actions, first expansion of a new node returns V without recording a root
visit, pi = N/Ntot) under three tree regimes:

    path   — fresh path-structured tree every move (our production search)
    tt     — fresh transposition-table tree every move (isolates the DAG)
    ttp    — persistent transposition table, reset every 2 games
             (the reference's exact regime)

Oracle: uniform prior over legal moves, V=0 (the iteration-1 random net).
Reported per regime: mean stored-pi entropy (the quantity plotted by the
reference), mean entropy by game stage, mean game length, and pi mass on
immediately-winning moves at win-in-1 positions.

CPU-only, no jax.  ~1 min per regime at default settings.
"""

from __future__ import annotations

import argparse
import math
import random
from collections import defaultdict

import numpy as np

F = np.float32
ROWS, COLS = 6, 7


class C4:
    """Minimal connect-four, white=0 moves first, reward from white's POV."""

    __slots__ = ("board", "player", "rew", "over", "_key")

    def __init__(self, board=None, player=0, rew=0.0, over=False):
        self.board = np.zeros((ROWS, COLS), np.int8) if board is None \
            else board
        self.player = player
        self.rew = rew
        self.over = over
        self._key = None

    def key(self):
        if self._key is None:
            self._key = (self.board.tobytes(), self.player)
        return self._key

    def legal(self):
        return self.board[ROWS - 1] == 0

    def step(self, col):
        b = self.board.copy()
        row = int(np.argmax(b[:, col] == 0))
        b[row, col] = self.player + 1
        won = _wins_at(b, row, col)
        over = won or (b != 0).all()
        rew = 0.0
        if won:
            rew = 1.0 if self.player == 0 else -1.0
        return C4(b, 1 - self.player, rew, over)

    def winning_moves(self):
        """Columns that win immediately for the player to move."""
        out = []
        for col in range(COLS):
            if self.board[ROWS - 1, col] != 0:
                continue
            row = int(np.argmax(self.board[:, col] == 0))
            self.board[row, col] = self.player + 1
            if _wins_at(self.board, row, col):
                out.append(col)
            self.board[row, col] = 0
        return out


def _wins_at(b, row, col):
    me = b[row, col]
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        n = 1
        for s in (1, -1):
            r, c = row + s * dr, col + s * dc
            while 0 <= r < ROWS and 0 <= c < COLS and b[r, c] == me:
                n += 1
                r += s * dr
                c += s * dc
        if n >= 4:
            return True
    return False


class Info:
    """StateInfo (``src/mcts.jl:78-87``): per-action P/W/N + oracle V.

    ``vstd``/``pstd`` emulate a RANDOM-INIT network oracle: per-state
    consistent pseudo-random outputs (seeded by the state key), with
    V ~ tanh(N(0, vstd)) and P = masked softmax of N(0, pstd) logits.
    The reference's iteration-1 Flux net measurably emits |V| ~ 0.4-0.5
    (``ui-first-iter.png``: learning-start Lv=1.024 > E[z^2]) while our
    flax-lecun init emits |V| ~ 0.09 — this probe quantifies how much
    that alone changes search decisiveness.
    """

    __slots__ = ("P", "W", "N", "V", "legal")

    def __init__(self, legal, state_key=None, vstd=0.0, pstd=0.0):
        k = int(legal.sum())
        self.legal = legal
        if (vstd or pstd) and state_key is not None:
            r = np.random.default_rng(abs(hash(state_key)) % (2 ** 63))
            logits = r.normal(0.0, pstd, COLS).astype(F) if pstd else \
                np.zeros(COLS, F)
            logits = np.where(legal, logits, -np.inf)
            e = np.exp(logits - logits.max())
            self.P = (e / e.sum()).astype(F)
            self.V = F(np.tanh(r.normal(0.0, vstd))) if vstd else F(0.0)
        else:
            self.P = np.where(legal, F(1.0 / k), F(0.0))
            self.V = F(0.0)
        self.W = np.zeros(COLS, F)
        self.N = np.zeros(COLS, np.int64)


class RefMCTS:
    """Reference-semantics recursive PUCT over a dict tree.

    ``transposition=True`` keys the dict by state (the reference's
    ``Dict{State,StateInfo}``); ``False`` keys it by the path from the
    current root (fresh-path-tree semantics of our array search).
    """

    def __init__(self, cpuct=2.0, eps=0.25, alpha=1.0, gamma=1.0,
                 transposition=True, rng=None, vstd=0.0, pstd=0.0):
        self.cpuct, self.eps, self.alpha, self.gamma = cpuct, eps, alpha, gamma
        self.transposition = transposition
        self.tree = {}
        self.rng = rng or np.random.default_rng(0)
        self.vstd, self.pstd = vstd, pstd
        self.depth_sum = 0
        self.sims = 0

    def reset(self):
        self.tree.clear()

    def _info(self, game, path):
        key = game.key() if self.transposition else path
        info = self.tree.get(key)
        if info is None:
            info = Info(game.legal(), state_key=game.key(),
                        vstd=self.vstd, pstd=self.pstd)
            self.tree[key] = info
            return info, True
        return info, False

    def _scores(self, info, eta, root):
        n = info.N.astype(F)
        q = info.W / np.maximum(n, F(1.0))
        P = info.P if not root else \
            F(1.0 - self.eps) * info.P + F(self.eps) * eta
        s = q + F(self.cpuct) * P * F(math.sqrt(n.sum())) / (n + F(1.0))
        return np.where(info.legal, s, -np.inf)

    def _simulate(self, game, path, eta, root):
        if game.over:
            self.depth_sum += len(path)
            return F(0.0)
        info, new = self._info(game, path)
        if new:
            self.depth_sum += len(path)
            return info.V
        a = int(np.argmax(self._scores(info, eta, root)))
        wp = game.player == 0
        nxt = game.step(a)
        wr = nxt.rew
        r = wr if wp else -wr
        qn = self._simulate(nxt, path + (a,), eta, False)
        if nxt.player != game.player:
            qn = -qn
        q = F(r + self.gamma * qn)
        info.W[a] += q
        info.N[a] += 1
        return q

    def explore(self, game, nsims):
        legal = game.legal()
        eta = np.zeros(COLS, F)
        eta[legal] = self.rng.dirichlet([self.alpha] * int(legal.sum()))
        for _ in range(nsims):
            self.sims += 1
            self._simulate(game, (), eta, True)

    def policy(self, game):
        info = self.tree[game.key() if self.transposition else ()]
        n = info.N.astype(np.float64)
        return n / max(n.sum(), 1.0)


def temperature(turn):
    """PLSchedule([0,20,30],[1.0,1.0,0.3]) indexed by turn
    (``games/connect-four/params.jl:28``)."""
    if turn <= 20:
        return 1.0
    if turn >= 30:
        return 0.3
    return 1.0 + (turn - 20) / 10.0 * (0.3 - 1.0)


def run(regime, num_games, nsims, seed, vstd=0.0, pstd=0.0):
    rng = np.random.default_rng(seed)
    mcts = RefMCTS(transposition=regime != "path", rng=rng,
                   vstd=vstd, pstd=pstd)
    ents, lens = [], []
    stage_ents = defaultdict(list)
    win1 = []
    for g in range(num_games):
        if regime != "ttp" or g % 2 == 0:
            mcts.reset()
        game, turn = C4(), 0
        while not game.over:
            if regime != "ttp":
                mcts.reset()
            mcts.explore(game, nsims)
            pi = mcts.policy(game)
            ent = float(-(pi[pi > 0] * np.log(pi[pi > 0])).sum())
            ents.append(ent)
            stage_ents[min(turn // 7, 4)].append(ent)
            wm = game.winning_moves()
            if wm:
                win1.append(float(pi[wm].sum()))
            tau = temperature(turn)
            w = pi ** (1.0 / tau)
            w /= w.sum()
            a = int(rng.choice(COLS, p=w))
            game = game.step(a)
            turn += 1
        lens.append(turn)
    print(f"regime={regime} games={num_games} sims={nsims} "
          f"vstd={vstd} pstd={pstd} positions={len(ents)}")
    print(f"  avg exploration depth {mcts.depth_sum / max(mcts.sims, 1):.2f}")
    print(f"  mean pi entropy     {np.mean(ents):.3f}")
    for s in sorted(stage_ents):
        print(f"    turns {s*7:2d}-{s*7+6:2d}{'+' if s == 4 else ' '}: "
              f"H={np.mean(stage_ents[s]):.3f}  (n={len(stage_ents[s])})")
    print(f"  mean game length    {np.mean(lens):.1f}")
    if win1:
        print(f"  win-in-1 pi mass    mean={np.mean(win1):.3f} "
              f"median={np.median(win1):.3f}  (n={len(win1)})")
    return float(np.mean(ents))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=40)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--regimes", default="path,tt,ttp")
    ap.add_argument("--vstd", type=float, default=0.0,
                    help="random-net oracle value-noise std (pre-tanh)")
    ap.add_argument("--pstd", type=float, default=0.0,
                    help="random-net oracle prior-logit std")
    args = ap.parse_args()
    for regime in args.regimes.split(","):
        run(regime, args.games, args.sims, args.seed,
            vstd=args.vstd, pstd=args.pstd)


if __name__ == "__main__":
    main()
