"""A straightforward recursive MCTS used as a test oracle.

This mirrors the *documented* search semantics of the reference
(``/root/reference/src/mcts.jl:180-226``) in plain python/numpy — PUCT
scoring, oracle expansion, reward discounting and sign flips — over a
path-structured tree (no transposition table, matching the array
implementation's documented divergence).  It exists only to validate
``alphazero_tpu.search.mcts`` edge-for-edge on small games.
"""

import numpy as np

WHITE = 0
F = np.float32


class PyTTT:
    """Minimal python tictactoe with the same conventions as the jax env."""

    A = 9

    def __init__(self, board=None, player=0, rew=0.0):
        self.board = np.zeros(9, np.int8) if board is None else board.copy()
        self.player = player
        self.rew = rew

    LINES = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (0, 3, 6), (1, 4, 7),
             (2, 5, 8), (0, 4, 8), (2, 4, 6)]

    def winner(self):
        for p in (1, 2):
            for ln in self.LINES:
                if all(self.board[i] == p for i in ln):
                    return p
        return 0

    def terminal(self):
        return self.winner() != 0 or (self.board != 0).all()

    def legal(self):
        return self.board == 0

    def step(self, a):
        nxt = PyTTT(self.board, 1 - self.player)
        nxt.board[a] = self.player + 1
        w = nxt.winner()
        nxt.rew = 0.0 if w == 0 else (1.0 if w == 1 else -1.0)
        return nxt


class Node:
    def __init__(self, game, oracle):
        self.game = game
        self.player = game.player
        self.terminal = game.terminal()
        self.reward = F(game.rew)
        self.legal = game.legal()
        p, v = oracle(game)
        self.P = np.asarray(p, F)
        self.value = F(v)
        self.W = np.zeros(game.A, F)
        self.N = np.zeros(game.A, np.int32)
        self.children = {}


class PyMCTS:
    """Recursive PUCT search matching ``src/mcts.jl:199-226`` semantics."""

    def __init__(self, game, oracle, num_sims, cpuct=1.0, gamma=1.0):
        self.oracle = oracle
        self.num_sims = num_sims
        self.cpuct = F(cpuct)
        self.gamma = F(gamma)
        self.root = Node(game, oracle)

    def scores(self, node):
        n = node.N.astype(F)
        q = node.W / np.maximum(n, F(1.0))
        sqrt_ntot = np.sqrt(n.sum(dtype=F))
        u = self.cpuct * node.P * sqrt_ntot / (n + F(1.0))
        s = q + u
        s[~node.legal] = -np.inf
        return s

    def simulate(self, node):
        if node.terminal:
            return F(0.0)
        a = int(np.argmax(self.scores(node)))
        if a in node.children:
            child = node.children[a]
            q_child = self.simulate(child)
        else:
            child = Node(node.game.step(a), self.oracle)
            node.children[a] = child
            q_child = F(0.0) if child.terminal else child.value
        r_white = child.reward
        r = r_white if node.player == WHITE else -r_white
        qnext = q_child if node.player == child.player else -q_child
        q = r + self.gamma * qnext
        node.W[a] = node.W[a] + q
        node.N[a] = node.N[a] + 1
        return q

    def run(self):
        for _ in range(self.num_sims):
            self.simulate(self.root)
        n = self.root.N.astype(F)
        return n / max(n.sum(), 1.0)
