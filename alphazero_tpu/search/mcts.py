"""Fully batched, on-device Monte-Carlo Tree Search.

TPU-native re-design of the reference's sequential, hashtable-based MCTS
(``/root/reference/src/mcts.jl``).  Instead of one ``Dict{State,StateInfo}``
per worker task with an async inference server (``src/batchifier.jl``), the
tree is a fixed-shape array structure over a whole *batch* of games,
traversed with ``lax.while_loop`` and updated in place, so that every
simulation step evaluates the network on all ``B`` leaf states in a single
tensor op.  The async batching layer of the reference disappears entirely.

Search semantics preserved exactly (validated in tests/test_mcts.py against a
pure-python transliteration of the documented algorithm):

* PUCT scores ``Q + cpuct * P * sqrt(Ntot) / (N+1)`` with ``Q = W / max(N,1)``
  (``src/mcts.jl:180-188``) — no AlphaGo-style init-Q.
* Root Dirichlet noise ``(1-eps) P + eps eta`` mixed *into the scores only*,
  with ``eta`` drawn once per call over legal actions
  (``src/mcts.jl:109-123,228-232``).
* Prior temperature applied to the oracle policy at node creation
  (``src/mcts.jl:157-161``).
* Backpropagation with intermediate rewards, discounting, and sign flips on
  player switches (``src/mcts.jl:199-226``); terminal states return value 0
  (``src/mcts.jl:200-201``) and absorb descents.
* Visit-count policy at the root (``src/mcts.jl:255-271``).

Performance layout (derived from on-chip ablations):

* node-major arrays ``[N, B, ...]`` — expansion writes are contiguous
  major-axis dynamic-update-slices that XLA keeps in place in the sim loop
  (lane-major layouts provoked full-array layout-transpose copies per sim);
* per-node data is packed into three f32 slabs (``meta``, ``prior_legal``,
  ``stats``) so each step of the descent costs three gathers instead of
  eight;
* all mutable statistics live in one slab, updated by a *single* batched
  scatter-add per simulation: the q-chain ``q_d = r_d + gamma*f_d*q_{d+1}``
  telescopes through prefix products into a reverse cumsum (closed-form
  backprop), and the child-pointer installation is folded into the same
  scatter because it is an exactly-once ``0 -> i+1`` add.

Design divergence (documented per SURVEY §7): the reference tree is a
transposition table keyed by state, shared across the moves of a game; here
each move gets a fresh per-move tree without transpositions.  This is the
standard array-MCTS trade-off (a few extra simulations re-derive the reused
subtree) and is validated on learning curves rather than node-for-node parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import core as envcore
from ..envs.core import Game

NEG_INF = np.float32(-1e30)  # numpy: no backend init at import

# An oracle evaluates a batch of states: (states, obs[B,...], mask[B,A]) ->
# (P[B,A] normalized over legal actions, V[B] from the current player's POV).
# This is the batched analogue of `oracle(state) -> (P, V)`
# (``src/mcts.jl:6-17``).
Oracle = Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]

# meta slab slots (parent/action power the cross-move subtree reuse)
_PLAYER, _TERMINAL, _REWARD, _VALUE, _PARENT, _ACTION = 0, 1, 2, 3, 4, 5
_META_W = 8


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search knobs, mirroring ``MctsParams`` (``src/params.jl:49-57``) minus
    the per-turn temperature (applied by the player, not the search)."""

    num_sims: int
    gamma: float = 1.0
    cpuct: float = 1.0
    dirichlet_eps: float = 0.0
    dirichlet_alpha: float = 1.0
    prior_temperature: float = 1.0
    # True: apply the per-sim stats update with the Pallas scalar-prefetch
    # kernel (ops/pallas_update.py; the XLA descent is kept).  Default off:
    # on TPU the kernel is blocked by minor-dim tile padding (see NOTES.md);
    # it runs bit-exact in interpret mode and on-chip for S=128-padded
    # shapes.  The standalone Pallas descent kernel lives in
    # ops/fused_mcts.py (pallas_select, tested in interpret mode); it only
    # breaks even with the tuned XLA descent at flagship tree sizes, so it
    # is not wired into the search loop.
    fused: Optional[bool] = None
    # Staged tree growth: after simulation i the tree holds at most i+1
    # nodes, so the sim loop runs in `stages` chunks whose node slabs are
    # sliced to a growing static capacity (evenly spaced, padded between
    # stages).  Per-sim descent gathers and expansion writes scale with the
    # slab capacity, so this cuts their average cost to ~(stages+1)/(2*
    # stages) of the full-size loop at the price of `stages` compiled loop
    # bodies.  1 disables staging; small searches stay single-stage.
    # Flagship-bench history: 6 was best before the in-descent reward
    # recording (574/581/585 samples/s at 4/6/8 stages); afterwards the
    # per-stage fixed cost shrank and 8 wins (715 -> 734 samples/s).
    stages: int = 8
    # Optional descent-depth cap (mctx-style).  The per-sim update cost is
    # proportional to the static path-buffer length, which defaults to the
    # game-length bound (43 for connect-four) while real tree depths rarely
    # exceed ~20; a cap cuts that cost.  A descent that hits the cap
    # backpropagates the deepest node's stored oracle value instead of
    # expanding (a semantics extension: the reference's depth is naturally
    # bounded by game length, ``src/mcts.jl:199-226``, so it never caps).
    max_depth: Optional[int] = None
    # Cross-move subtree reuse (self-play): carry the played action's child
    # subtree (up to reuse_cap nodes) into the next move's search as its
    # warm root.  This mirrors the reference's per-game transposition table,
    # which persists across moves (``src/mcts.jl:124-151``).  Measured
    # HARMFUL at large sim budgets: at 600 sims with a trained net the
    # warm side loses to fresh trees monotonically in carried size
    # (avgr -0.04/-0.43/-0.78 at cap 64/256/604, scripts/bisect_reuse.py)
    # even though the mechanism provably matches reference persistence
    # semantics (tests/test_reuse.py).  Keep off unless sims are small.
    reuse_tree: bool = False
    reuse_cap: int = 64
    # Backprop-update formulation: "scatter" = one flat scatter-add
    # (TPU scatters serialize at ~20 ns/slot inside the sim loop);
    # "dense" = one-hot batched matmul on the MXU producing the full dense
    # update, plus one slab add.  Semantically identical up to float
    # summation order (tests/test_mcts.py::test_dense_update_matches_
    # scatter).  Measured at flagship shapes (scripts/profile_update.py):
    # scatter 2.55 ms/sim vs dense 0.65 — TPU scatters serialize per slot
    # while the MXU eats the one-hot contraction; flagship bench 427 ->
    # 585 samples/s.  Default dense.
    update: str = "dense"
    # Descent row-lookup formulation: "take" = XLA gather (one per slab per
    # step of the pointer chase); "onehot" = masked one-hot reduction over
    # the node axis (VPU elementwise + reduce, no gather op).  Bit-identical
    # results; which wins is a latency question (the descent is a serial
    # chain of these lookups).  Measured on the chip at flagship shapes
    # (B=1024, 600 sims, ResNet-5x128 bf16 oracle): the XLA gather op costs
    # ~40 us of fixed latency per descent step while the one-hot masked
    # reduction streams the (staged) slabs at HBM rate, winning ~22% of
    # END-TO-END self-play throughput at both shallow and deep game stages
    # (842 -> 1027 samples/s over opening moves, 679 -> 827 over 24 moves,
    # BENCH_GATHER A/B).  Default onehot.
    gather: str = "onehot"
    # Descent engine: "pallas" = the fused Mosaic kernel
    # (ops/fused_mcts.pallas_select) walking the whole descent in one
    # launch over VMEM-staged lanes-minor slabs.  Round-5 close-out of the
    # rounds-2..4 carry: the kernel is bit-exact on chip and 2.85x faster
    # than the XLA `_select` on an ISOLATED full-depth descent at flagship
    # shape (0.69 vs 1.97 ms, scripts/profile_select), but END-TO-END it
    # loses at every configuration measured on chip (bench.py A/B:
    # all-pallas 929 vs 1035 samples/s at stages=8; monotone recovery as
    # fewer stages use it — 938/948/1003 at min_cap 376/451/527; at
    # stages=1 pallas 581 vs xla 694).  In-program, each sim's kernel
    # launch re-streams the whole staged slab right after the update wrote
    # it (a serialized HBM round-trip XLA's loop overlaps away) and real
    # descents early-exit far shallower than the isolated measurement.
    # None (default) = "xla".  The kernel remains a validated opt-in
    # (engine-parity tests run both).
    descent: Optional[str] = None
    # Stage-cap threshold for the "pallas" engine: stages whose node slab
    # holds fewer than this many slots keep the XLA descent (the kernel's
    # full-slab stream loses hardest on small early-stage slabs).
    descent_min_cap: int = 256


class Tree(NamedTuple):
    """Node-major array tree over a batch of B games.

    ``N = num_sims + 1`` node slots per game; node 0 is the root; node ``i``
    is the node expanded by simulation ``i`` (a slot stays dead when the
    simulation ended on a terminal node instead of expanding).

    ``AP`` is the action width padded up to a multiple of 8.

    Numeric slabs are laid out LANES-MINOR ``[N, W, B]`` (round-5 flip):
    per-lane walk state in the Pallas descent kernel
    (``ops/fused_mcts.pallas_select``) then costs one vector-register row
    per 128 lanes, and expansion writes stay contiguous same-slot DUS.
    The state pytree stays lane-major ``[N, B, ...]`` (env-shaped ops).
    """

    states: Any             # pytree, leaves [N, B, ...]
    meta: jnp.ndarray       # f32 [N, 8, B]: player, terminal, reward, value
    prior_legal: jnp.ndarray  # f32 [N, 2*AP, B]: prior | legal(0/1)
    stats: jnp.ndarray      # f32 [N, 3*AP, B]: qsum | visits | child+1


class SearchResults(NamedTuple):
    policy: jnp.ndarray        # f32 [B, A] visit-count distribution
    root_visits: jnp.ndarray   # i32 [B, A]
    root_q: jnp.ndarray        # f32 [B, A] mean action values at root
    root_value: jnp.ndarray    # f32 [B] oracle value of root
    nodes_traversed: jnp.ndarray  # i32 [] total edges walked (for depth stats)
    tree: Tree


def _pad_width(a: int) -> int:
    return ((a + 7) // 8) * 8


def _row_gather(x, idx):
    """x: [N, B, ...], idx: [B] -> [B, ...] (per-lane node row lookup)."""
    B = x.shape[1]
    return jax.vmap(lambda i, b: x[i, b])(idx, jnp.arange(B))


def _slab_gather(x, idx):
    """x: [N, W, B] (lanes-minor), idx: [B] -> [B, W] per-lane row."""
    B = x.shape[2]
    return jax.vmap(lambda i, b: x[i, :, b])(idx, jnp.arange(B))


def _apply_prior_temperature(p, legal, tau):
    """``Util.apply_temperature`` on the legal slice (``src/mcts.jl:157-161``)."""
    if tau == 1.0:
        return p
    powed = jnp.where(p > 0, p, 1.0) ** (1.0 / max(tau, 1e-6))
    powed = jnp.where(legal & (p > 0), powed, 0.0)
    return powed / jnp.maximum(jnp.sum(powed, -1, keepdims=True), 1e-30)


def dirichlet_noise(key, legal, alpha):
    """Dirichlet(alpha) over legal actions (``src/mcts.jl:228-232``)."""
    g = jax.random.gamma(key, alpha, legal.shape).astype(jnp.float32)
    g = jnp.where(legal, g, 0.0)
    return g / jnp.maximum(jnp.sum(g, -1, keepdims=True), 1e-30)


def _pack_meta(game: Game, states, value, parent=None, action=None):
    """[B, 8] meta rows for a batch of states."""
    B = value.shape[0]
    meta = jnp.zeros((B, _META_W), jnp.float32)
    meta = meta.at[:, _PLAYER].set(
        jax.vmap(game.to_play)(states).astype(jnp.float32))
    meta = meta.at[:, _TERMINAL].set(
        jax.vmap(game.terminated)(states).astype(jnp.float32))
    meta = meta.at[:, _REWARD].set(jax.vmap(game.reward)(states))
    meta = meta.at[:, _VALUE].set(value.astype(jnp.float32))
    meta = meta.at[:, _PARENT].set(
        -1.0 if parent is None else parent.astype(jnp.float32))
    if action is not None:
        meta = meta.at[:, _ACTION].set(action.astype(jnp.float32))
    return meta


def _pack_prior_legal(p, legal, ap: int):
    B, A = p.shape
    out = jnp.zeros((B, 2 * ap), jnp.float32)
    out = out.at[:, :A].set(p)
    out = out.at[:, ap:ap + A].set(legal.astype(jnp.float32))
    return out


def init_tree(game: Game, cfg: MCTSConfig, roots, root_p, root_v,
              capacity: Optional[int] = None) -> Tree:
    """Allocate the node slabs and install the evaluated roots."""
    B = root_p.shape[0]
    N = capacity if capacity is not None else cfg.num_sims + 1
    ap = _pad_width(game.num_actions)

    root_legal = jax.vmap(game.legal_mask)(roots)
    prior = _apply_prior_temperature(root_p, root_legal, cfg.prior_temperature)

    def alloc(x):
        return jnp.zeros((N,) + x.shape, x.dtype).at[0].set(x)

    def alloc_slab(row_bw):  # [B, W] root row -> [N, W, B] lanes-minor slab
        return jnp.zeros((N, row_bw.shape[1], B),
                         row_bw.dtype).at[0].set(row_bw.T)

    meta0 = _pack_meta(game, roots, root_v)
    # the root's reward slot is never used; zero it for cleanliness
    meta0 = meta0.at[:, _REWARD].set(0.0)
    return Tree(
        states=jax.tree.map(alloc, roots),
        meta=alloc_slab(meta0),
        prior_legal=alloc_slab(_pack_prior_legal(prior, root_legal, ap)),
        stats=jnp.zeros((N, 3 * ap, B), jnp.float32),
    )


class _SelectState(NamedTuple):
    cur: jnp.ndarray            # i32 [B] current node during descent
    cur_player: jnp.ndarray     # f32 [B] player at the node `cur` was
    #                                 reached FROM (the pending edge's parent)
    edge_moved: jnp.ndarray     # bool [B] an edge into `cur` awaits r/f
    done: jnp.ndarray           # bool [B] descent finished
    expand_parent: jnp.ndarray  # i32 [B] parent of expansion edge (-1: none)
    expand_action: jnp.ndarray  # i32 [B]
    depth: jnp.ndarray          # i32 [B] edges recorded so far
    path_nodes: jnp.ndarray     # i32 [B, D]
    path_actions: jnp.ndarray   # i32 [B, D]
    path_r: jnp.ndarray         # f32 [B, D] per-edge reward (parent POV)
    path_f: jnp.ndarray         # f32 [B, D] per-edge sign factor (1 off-path)
    d: jnp.ndarray              # i32 [] loop counter


def _select(tree: Tree, eta, cfg: MCTSConfig, max_depth: int, num_actions: int,
            root_action=None, nonroot_scores=None) -> _SelectState:
    """Walk every lane down its tree until an unexpanded edge or a terminal
    node is hit (the in-tree phase of ``run_simulation!``,
    ``src/mcts.jl:199-226``).

    Hooks for non-PUCT variants (search/gumbel.py): ``root_action [B]``
    forces the action taken at the root; ``nonroot_scores(p, legal, qsum,
    nvis, value) -> [B, A]`` replaces the PUCT score at interior nodes.

    Per-edge backprop inputs (reward from the parent's POV and the
    player-switch sign factor, ``src/mcts.jl:214-221``) are recorded
    *during* the descent — the expansion edge, whose child does not exist
    yet, is filled in by the caller after :func:`expand`.  This saves two
    whole-path meta gathers per simulation versus recomputing them post-hoc.

    Latency structure: the loop body performs exactly ONE serial row lookup
    (all three slabs at ``cur``, issued in parallel) followed by the argmax
    and child-pointer read.  The edge INTO ``cur`` is therefore recorded one
    iteration late, from the meta row gathered at the top of the next
    iteration (terminal detection shifts likewise); the final pending edge
    of lanes still walking at loop exit (depth-capped, or terminal reached
    on the last permitted iteration) is fixed up by one post-loop gather.
    The previous formulation gathered the CHILD's meta inside the body —
    two chained gathers per iteration — and the serial descent dominates
    flagship self-play cost, so halving the chain is a direct win.
    """
    N, _, B = tree.meta.shape
    A = num_actions
    ap = tree.prior_legal.shape[1] // 2
    if cfg.gather == "onehot":
        iota_n = jnp.arange(N)

        def slab_gather(x, idx):
            # masked reduction over the node axis: no gather op in the
            # serial descent chain (cost O(N*W) VPU work per step)
            oh = (iota_n[:, None] == idx[None, :]).astype(x.dtype)
            return jnp.einsum("nb,nwb->bw", oh, x)
    else:
        slab_gather = _slab_gather
    init = _SelectState(
        cur=jnp.zeros((B,), jnp.int32),
        cur_player=tree.meta[0, _PLAYER, :],
        edge_moved=jnp.zeros((B,), bool),
        done=tree.meta[0, _TERMINAL, :] > 0.5,
        expand_parent=jnp.full((B,), -1, jnp.int32),
        expand_action=jnp.zeros((B,), jnp.int32),
        depth=jnp.zeros((B,), jnp.int32),
        path_nodes=jnp.zeros((B, max_depth), jnp.int32),
        path_actions=jnp.zeros((B, max_depth), jnp.int32),
        path_r=jnp.zeros((B, max_depth), jnp.float32),
        path_f=jnp.ones((B, max_depth), jnp.float32),
        d=jnp.zeros((), jnp.int32),
    )

    def edge_rf(parent_player, meta_cur):
        """Backprop inputs of the edge into the row ``meta_cur``: reward
        from the parent's POV and the player-switch sign factor
        (``src/mcts.jl:214-221``)."""
        r_white = meta_cur[:, _REWARD]
        r = jnp.where(parent_player == envcore.WHITE, r_white, -r_white)
        f = jnp.where(parent_player == meta_cur[:, _PLAYER], 1.0, -1.0)
        return r, f

    def cond(s):
        return jnp.any(~s.done) & (s.d < max_depth)

    def body(s):
        stats = slab_gather(tree.stats, s.cur)          # [B, 3*ap]
        pl = slab_gather(tree.prior_legal, s.cur)       # [B, 2*ap]
        meta_cur = slab_gather(tree.meta, s.cur)        # [B, 8]
        # record the edge traversed LAST iteration (into `cur`), now that
        # cur's meta row is in hand; placeholder (0, 1) written elsewhere
        # (slot s.d-1 is placeholder-valued for every non-moved lane)
        r_prev, f_prev = edge_rf(s.cur_player, meta_cur)
        dm1 = jnp.maximum(s.d - 1, 0)   # s.d == 0 writes (0, 1) over init
        path_r = jax.lax.dynamic_update_slice(
            s.path_r, jnp.where(s.edge_moved, r_prev, 0.0)[:, None], (0, dm1))
        path_f = jax.lax.dynamic_update_slice(
            s.path_f, jnp.where(s.edge_moved, f_prev, 1.0)[:, None], (0, dm1))
        done = s.done | (s.edge_moved & (meta_cur[:, _TERMINAL] > 0.5))
        active = ~done
        qsum = stats[:, :A]
        nvis = stats[:, ap:ap + A]
        childp1 = stats[:, 2 * ap:2 * ap + A]
        p = pl[:, :A]
        legal = pl[:, ap:ap + A] > 0.5
        is_root = (s.cur == 0)[:, None]
        if cfg.dirichlet_eps > 0:
            p = jnp.where(is_root,
                          (1.0 - cfg.dirichlet_eps) * p
                          + cfg.dirichlet_eps * eta, p)
        if nonroot_scores is None:
            q = qsum / jnp.maximum(nvis, 1.0)
            sqrt_ntot = jnp.sqrt(jnp.sum(nvis, -1, keepdims=True))
            scores = jnp.where(legal,
                               q + cfg.cpuct * p * sqrt_ntot / (nvis + 1.0),
                               NEG_INF)
        else:
            scores = jnp.where(legal,
                               nonroot_scores(p, legal, qsum, nvis,
                                              meta_cur[:, _VALUE]),
                               NEG_INF)
        action = jnp.argmax(scores, -1).astype(jnp.int32)
        if root_action is not None:
            action = jnp.where(s.cur == 0, root_action, action)
        child = (jnp.take_along_axis(childp1, action[:, None], 1)[:, 0]
                 ).astype(jnp.int32) - 1
        # record the traversed edge (including the expansion edge); active
        # lanes all sit at depth == loop counter, so this is an in-place
        # dynamic_update_slice, not a scatter
        path_nodes = jax.lax.dynamic_update_slice(
            s.path_nodes, jnp.where(active, s.cur, -1)[:, None], (0, s.d))
        path_actions = jax.lax.dynamic_update_slice(
            s.path_actions, jnp.where(active, action, 0)[:, None], (0, s.d))
        depth = s.depth + active.astype(jnp.int32)
        needs_expand = active & (child < 0)
        expand_parent = jnp.where(needs_expand, s.cur, s.expand_parent)
        expand_action = jnp.where(needs_expand, action, s.expand_action)
        done = done | needs_expand
        edge_moved = active & ~needs_expand
        cur = jnp.where(edge_moved, child, s.cur)
        cur_player = jnp.where(active, meta_cur[:, _PLAYER], s.cur_player)
        return _SelectState(cur, cur_player, edge_moved, done,
                            expand_parent, expand_action, depth, path_nodes,
                            path_actions, path_r, path_f, s.d + 1)

    s = jax.lax.while_loop(cond, body, init)
    # lanes still walking at loop exit (depth-capped, or a terminal entered
    # on the final iteration) have the edge into `cur` pending: one fixup
    # gather records its r/f and classifies terminal arrivals as done (so
    # the caller's depth-cap leaf value only applies to true cap hits)
    pending = ~s.done
    meta_fix = _slab_gather(tree.meta, s.cur)
    r_fix, f_fix = edge_rf(s.cur_player, meta_fix)
    at_last = jnp.arange(max_depth)[None, :] == (s.depth - 1)[:, None]
    write = at_last & pending[:, None]
    path_r = jnp.where(write, r_fix[:, None], s.path_r)
    path_f = jnp.where(write, f_fix[:, None], s.path_f)
    done = s.done | (pending & (meta_fix[:, _TERMINAL] > 0.5))
    return s._replace(path_r=path_r, path_f=path_f, done=done)


def _q_chain(r, f, depth, leaf_value, gamma: float, D: int):
    """Closed-form backprop values from per-edge rewards/sign factors.

    The recursion ``q_d = r_d + gamma * f_d * q_{d+1}`` (``src/mcts.jl:
    214-221``) telescopes with the prefix factor ``h_d = gamma^d *
    prod_{j<d} f_j`` into ``h_d q_d = sum_{k>=d} h_k r_k + h_depth v`` —
    one reverse cumulative sum.  ``r``/``f`` are zero/one beyond the path.
    """
    B = r.shape[0]
    didx = jnp.arange(D)[None, :]
    on_path = didx < depth[:, None]
    f_excl = jnp.concatenate([jnp.ones((B, 1)), f[:, :-1]], axis=1)
    h = (gamma ** didx.astype(jnp.float32)) * jnp.cumprod(f_excl, axis=1)
    h_ext = jnp.concatenate([h, h[:, -1:] * f[:, -1:] * gamma], axis=1)
    h_leaf = jax.vmap(lambda row, i: row[i])(h_ext, depth)
    rev_cumsum = jnp.cumsum((h * r)[:, ::-1], axis=1)[:, ::-1]
    s_vals = rev_cumsum + (h_leaf * leaf_value)[:, None]
    return jnp.where(on_path, s_vals / h, 0.0), on_path


def _edge_updates(sel: _SelectState, exp_r, exp_f, leaf_value,
                  cfg: MCTSConfig, max_depth: int):
    """``_q_chain`` over the per-edge rewards/signs recorded by the descent.

    ``exp_r``/``exp_f`` [B] are the expansion edge's reward/sign (computed
    by :func:`expand` from the freshly created child), spliced into the
    final path slot of expanding lanes (``exp_f`` must be 1 elsewhere, and
    ``exp_r`` 0, so the splice is a no-op on non-expanding lanes).

    Returns ``(q_edges [B, D], on_path [B, D], nodes, actions)``.
    """
    D = max_depth
    didx = jnp.arange(D)[None, :]
    at_last = didx == (sel.depth - 1)[:, None]
    r = jnp.where(at_last, sel.path_r + exp_r[:, None], sel.path_r)
    f = jnp.where(at_last, sel.path_f * exp_f[:, None], sel.path_f)
    q_edges, on_path = _q_chain(r, f, sel.depth, leaf_value, cfg.gamma, D)
    nodes = jnp.where(on_path, sel.path_nodes, 0)
    actions = jnp.where(on_path, sel.path_actions, 0)
    return q_edges, on_path, nodes, actions


def _grow(tree: Tree, new_cap: int) -> Tree:
    """Pad every node slab with dead slots up to ``new_cap`` (stage boundary)."""

    def pad(x):
        extra = jnp.zeros((new_cap - x.shape[0],) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, extra], axis=0)

    return Tree(states=jax.tree.map(pad, tree.states), meta=pad(tree.meta),
                prior_legal=pad(tree.prior_legal), stats=pad(tree.stats))


def _stage_caps(num_sims: int, stages: int):
    """Evenly spaced node-slab capacities; stage k may run sims < caps[k]."""
    N = num_sims + 1
    if stages <= 1 or N <= 2 * stages or num_sims < 128:
        return [N]
    caps = sorted({round(N * (k + 1) / stages) for k in range(stages)})
    caps[-1] = N
    return caps


def _install_carried(fresh: Tree, car: Tree, valid) -> Tree:
    """Overwrite slots [0, K) of a freshly initialized tree with the carried
    slabs on lanes where ``valid`` (other lanes keep the fresh root)."""
    K = car.meta.shape[0]
    B = car.meta.shape[2]

    def put(f, c):  # state leaves: [K, B, ...]
        v = valid.reshape((1, B) + (1,) * (c.ndim - 2))
        return f.at[:K].set(jnp.where(v, c, f[:K]))

    def put_slab(f, c):  # lanes-minor slabs: [K, W, B]
        v = valid.reshape((1, 1, B))
        return f.at[:K].set(jnp.where(v, c, f[:K]))

    return Tree(states=jax.tree.map(put, fresh.states, car.states),
                meta=put_slab(fresh.meta, car.meta),
                prior_legal=put_slab(fresh.prior_legal, car.prior_legal),
                stats=put_slab(fresh.stats, car.stats))


def empty_carry(game: Game, carry_cap: int, num_lanes: int) -> Tuple[Tree, jnp.ndarray]:
    """All-invalid carry state (the scan-carry init for reusing self-play)."""
    ap = _pad_width(game.num_actions)
    B = num_lanes
    template = game.init_batch(B)
    tree = Tree(
        states=jax.tree.map(
            lambda x: jnp.zeros((carry_cap,) + x.shape, x.dtype), template),
        meta=jnp.zeros((carry_cap, _META_W, B), jnp.float32),
        prior_legal=jnp.zeros((carry_cap, 2 * ap, B), jnp.float32),
        stats=jnp.zeros((carry_cap, 3 * ap, B), jnp.float32),
    )
    return tree, jnp.zeros((B,), bool)


def advance_root(game: Game, tree: Tree, actions, carry_cap: int
                 ) -> Tuple[Tree, jnp.ndarray]:
    """Compact the subtree under each lane's played action into fresh slabs
    of capacity ``carry_cap`` (the root of the new slab = that child).

    This realizes the reference's cross-move tree persistence (its
    state-keyed table survives between moves, ``src/mcts.jl:124-151``) in
    array form: an ancestor-chain membership scan (parents always precede
    children in slot order), an exclusive-cumsum relabeling, one row-gather
    per slab, and a pointer remap.  Nodes beyond ``carry_cap`` are dropped;
    their ancestors keep the (still valid) aggregated visit statistics and
    the dangling child pointers are reset to "unexpanded".

    Returns ``(carried_tree, valid [B])``; lanes whose played child was
    never expanded come back invalid (nothing to carry).
    """
    C, _, B = tree.meta.shape
    ap = tree.prior_legal.shape[1] // 2
    brange = jnp.arange(B)
    K = carry_cap

    childp1 = _slab_gather(tree.stats, jnp.zeros((B,), jnp.int32))
    childp1 = jax.vmap(lambda row, a: row[2 * ap + a])(
        childp1, actions.astype(jnp.int32))
    r = childp1.astype(jnp.int32) - 1                       # [B]; -1: none
    valid = r >= 0

    # per-move (not per-sim) compaction: work lane-major, one transpose
    # in/out of the lanes-minor production layout is noise here
    meta_bw = jnp.transpose(tree.meta, (0, 2, 1))           # [C, B, 8]
    prior_bw = jnp.transpose(tree.prior_legal, (0, 2, 1))
    stats_bw = jnp.transpose(tree.stats, (0, 2, 1))

    parent = meta_bw[:, :, _PARENT].astype(jnp.int32)       # [C, B]

    def member_body(i, member):
        par = parent[i]
        pm = jax.vmap(lambda p, b: member[p, b])(jnp.maximum(par, 0), brange)
        m = (i == r) | ((par >= 0) & pm)
        return member.at[i].set(m)

    member = jax.lax.fori_loop(
        1, C, member_body, jnp.zeros((C, B), bool))
    newidx = jnp.cumsum(member.astype(jnp.int32), axis=0) - member
    keep = member & (newidx < K)
    n_kept = jnp.sum(keep.astype(jnp.int32), axis=0)        # [B]

    # scatter old slot index i into its destination row
    dest = jnp.where(keep, newidx, K)
    src = jnp.zeros((K + 1, B), jnp.int32)
    src = src.at[dest, jnp.broadcast_to(brange, (C, B))].set(
        jnp.broadcast_to(jnp.arange(C)[:, None], (C, B)), mode="drop")
    src = src[:K]

    live = jnp.arange(K)[:, None] < n_kept[None, :]          # [K, B]

    def take(slab):
        rows = jax.vmap(lambda idx: _row_gather(
            slab.reshape(slab.shape[:2] + (-1,)), idx))(src)
        rows = rows.reshape((K,) + slab.shape[1:2] + slab.shape[2:])
        mask = live.reshape((K, B) + (1,) * (slab.ndim - 2))
        return jnp.where(mask, rows, jnp.zeros((), slab.dtype))

    new_states = jax.tree.map(take, tree.states)
    new_meta = take(meta_bw)
    new_prior = take(prior_bw)
    new_stats = take(stats_bw)

    # old-index -> new-index+1 (0 = dropped/unexpanded), for pointer remaps
    map01 = jnp.where(keep, newidx + 1, 0).astype(jnp.float32)  # [C, B]
    oldc = new_stats[:, :, 2 * ap:].astype(jnp.int32) - 1       # [K, B, ap]
    bidx = jnp.broadcast_to(brange[None, :, None], oldc.shape)
    newc = jnp.where(oldc >= 0,
                     map01[jnp.clip(oldc, 0, C - 1), bidx], 0.0)
    new_stats = new_stats.at[:, :, 2 * ap:].set(newc)
    oldp = new_meta[:, :, _PARENT].astype(jnp.int32)            # [K, B]
    bidx2 = jnp.broadcast_to(brange[None, :], oldp.shape)
    newp = jnp.where(oldp >= 0,
                     map01[jnp.clip(oldp, 0, C - 1), bidx2] - 1.0, -1.0)
    new_meta = new_meta.at[:, :, _PARENT].set(newp)

    carried = Tree(states=new_states,
                   meta=jnp.transpose(new_meta, (0, 2, 1)),
                   prior_legal=jnp.transpose(new_prior, (0, 2, 1)),
                   stats=jnp.transpose(new_stats, (0, 2, 1)))
    return carried, valid


def search(game: Game, oracle: Oracle, roots, rng, cfg: MCTSConfig,
           max_depth: Optional[int] = None,
           root_action_fn=None, nonroot_scores=None,
           carried=None) -> SearchResults:
    """Run ``cfg.num_sims`` batched MCTS simulations from ``roots`` [B, ...].

    ``root_action_fn(tree, i) -> [B]`` / ``nonroot_scores`` hook in non-PUCT
    selection rules (used by the Gumbel variant, search/gumbel.py).

    ``carried = (tree, valid)`` warm-starts lanes where ``valid`` with a
    compacted subtree from the previous move (see :func:`advance_root`);
    its slabs occupy slots ``[0, reuse_cap)`` and new expansions write at
    ``reuse_cap + i - 1``, preserving the same-slot contiguous-DUS layout.

    The batched analogue of ``MCTS.explore!`` + ``MCTS.policy``
    (``src/mcts.jl:239-271``).  Jit-compatible; call under ``jax.jit`` (or
    inside a jitted self-play loop).
    """
    if max_depth is None:
        max_depth = (cfg.max_depth if cfg.max_depth is not None
                     else game.max_game_length + 1)
    max_depth = min(max_depth, game.max_game_length + 1)
    A = game.num_actions
    ap = _pad_width(A)
    B = jax.tree.leaves(roots)[0].shape[0]
    noise_key, rng = jax.random.split(rng)

    root_obs = jax.vmap(game.observe)(roots)
    root_mask = jax.vmap(game.legal_mask)(roots)
    root_p, root_v = oracle(roots, root_obs, root_mask)
    eta = dirichlet_noise(noise_key, root_mask, cfg.dirichlet_alpha)
    brange = jnp.arange(B)

    step_keys = jax.random.split(rng, cfg.num_sims)
    use_fused = bool(cfg.fused)

    # slots [0, K_base) hold the root (fresh: K_base=1) or the carried
    # subtree; simulation i expands into slot K_base + i - 1
    K_base = 1 if carried is None else carried[0].meta.shape[0]

    def expand(tree, i, expand_parent, expand_action):
        """Step the env over the expansion edge and write the new node's
        slot (same index for every lane -> in-place contiguous DUS)."""
        slot = K_base + i - 1
        expanding = expand_parent >= 0
        parent_idx = jnp.maximum(expand_parent, 0)
        parent_states = jax.tree.map(
            lambda x: _row_gather(x.reshape(x.shape[:2] + (-1,)), parent_idx
                                  ).reshape((B,) + x.shape[2:]),
            tree.states)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            step_keys[i - 1], brange)
        child_states = jax.vmap(game.step)(
            parent_states, expand_action, keys)
        child_obs = jax.vmap(game.observe)(child_states)
        child_mask = jax.vmap(game.legal_mask)(child_states)
        child_p, child_v = oracle(child_states, child_obs, child_mask)
        child_terminal = jax.vmap(game.terminated)(child_states)
        child_prior = _apply_prior_temperature(
            child_p, child_mask, cfg.prior_temperature)

        def put(arr, val):
            """DUS the [1, B, ...] slice ``val`` at the expansion slot;
            lanes where nothing expands keep their old row."""
            old = jax.lax.dynamic_slice_in_dim(arr, slot, 1, axis=0)
            sel_mask = expanding.reshape((1, B) + (1,) * (val.ndim - 2))
            new = jnp.where(sel_mask, val, old)
            return jax.lax.dynamic_update_slice_in_dim(arr, new, slot, axis=0)

        def put_slab(arr, row_bw):
            """Same-slot DUS of a lanes-minor slab row: [B, W] -> slot."""
            old = jax.lax.dynamic_slice_in_dim(arr, slot, 1, axis=0)
            new = jnp.where(expanding[None, None, :], row_bw.T[None], old)
            return jax.lax.dynamic_update_slice_in_dim(arr, new, slot, axis=0)

        tree = tree._replace(
            states=jax.tree.map(
                lambda a, v: put(a, v[None]), tree.states, child_states),
            meta=put_slab(tree.meta,
                          _pack_meta(game, child_states, child_v,
                                     parent=jnp.where(expanding, parent_idx,
                                                      -1),
                                     action=expand_action)),
            prior_legal=put_slab(tree.prior_legal,
                                 _pack_prior_legal(child_prior, child_mask,
                                                   ap)),
        )
        # leaf value: oracle value at the new node (0 if terminal,
        # ``src/mcts.jl:200-201,205-207``); terminal descents use 0.
        leaf_value = jnp.where(expanding & ~child_terminal, child_v, 0.0)
        # expansion-edge reward/sign (the descent could not record them:
        # the child did not exist yet); neutral on non-expanding lanes
        parent_player = jax.vmap(game.to_play)(
            parent_states).astype(jnp.float32)
        child_player = jax.vmap(game.to_play)(
            child_states).astype(jnp.float32)
        r_white = jax.vmap(game.reward)(child_states)
        exp_r = jnp.where(
            expanding,
            jnp.where(parent_player == envcore.WHITE, r_white, -r_white), 0.0)
        exp_f = jnp.where(
            expanding,
            jnp.where(parent_player == child_player, 1.0, -1.0), 1.0)
        return (tree, child_states, leaf_value.astype(jnp.float32),
                parent_idx, exp_r, exp_f)

    depth_capped = max_depth < game.max_game_length + 1

    def cap_leaf_value(tree, sel, leaf_value):
        """Depth-capped descents (neither expanded nor terminal) backprop
        the deepest node's stored oracle value (from that node's POV; the
        q-chain sign factors handle the rest)."""
        if not depth_capped:
            return leaf_value
        capped = ~sel.done
        stored_v = _slab_gather(tree.meta, sel.cur)[:, _VALUE]
        return jnp.where(capped, stored_v, leaf_value)

    S = 3 * ap

    def apply_update_xla(stats, nodes, actions, on_path, q_edges,
                         expanding, parent_idx, expand_action, child_val):
        cap = stats.shape[0]
        oob = cap * B * S
        # lanes-minor flat index of entry (node, col, lane)
        base = (nodes * S + actions) * B + brange[:, None]
        idx_q = jnp.where(on_path, base, oob)
        idx_v = jnp.where(on_path, base + ap * B, oob)
        idx_c = jnp.where(
            expanding,
            (parent_idx * S + 2 * ap + expand_action) * B + brange,
            oob)
        all_idx = jnp.concatenate(
            [idx_q.reshape(-1), idx_v.reshape(-1), idx_c])
        all_upd = jnp.concatenate(
            [q_edges.reshape(-1),
             on_path.astype(jnp.float32).reshape(-1),
             child_val])
        return stats.reshape(-1).at[all_idx].add(
            all_upd, mode="drop", unique_indices=True).reshape(cap, S, B)

    def apply_update_dense(stats, nodes, actions, on_path, q_edges,
                           expanding, parent_idx, expand_action, child_val):
        """One-hot batched matmul on the MXU: per lane,
        ``[D+1, cap+1]^T @ [D+1, S] -> [cap+1, S]`` where rows 0..D-1 carry
        the path-edge qsum/visit columns and row D the exactly-once
        child-pointer install; off-path/non-expanding rows hit the padding
        node row ``cap`` (sliced off).  f32 dot (bf16x3 on the MXU) keeps
        visit counts exact and qsum at f32 fidelity."""
        cap, S, _ = stats.shape
        D = q_edges.shape[1]
        node_rows = jnp.concatenate(
            [jnp.where(on_path, nodes, cap),
             jnp.where(expanding, parent_idx, cap)[:, None]], axis=1)
        lhs = (node_rows[:, :, None] ==
               jnp.arange(cap + 1)[None, None, :]).astype(jnp.float32)
        a_onehot = (actions[:, :, None] ==
                    jnp.arange(ap)[None, None, :]).astype(jnp.float32)
        qcols = a_onehot * q_edges[:, :, None]
        vcols = a_onehot * on_path.astype(jnp.float32)[:, :, None]
        rows_d = jnp.concatenate(
            [qcols, vcols, jnp.zeros((B, D, S - 2 * ap))], axis=-1)
        c_onehot = (expand_action[:, None] ==
                    jnp.arange(ap)[None, :]).astype(jnp.float32)
        row_child = jnp.concatenate(
            [jnp.zeros((B, 2 * ap)), c_onehot * child_val[:, None],
             jnp.zeros((B, S - 3 * ap))], axis=-1)
        rhs = jnp.concatenate([rows_d, row_child[:, None, :]], axis=1)
        upd = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [B, cap+1, S]
        return stats + jnp.transpose(upd[:, :cap, :], (1, 2, 0))

    apply_update = (apply_update_dense if cfg.update == "dense"
                    else apply_update_xla)

    def run_staged(body_fn):
        """Drive ``body_fn`` over sims 1..num_sims in growing-capacity stages
        (slab padded at each boundary; see ``MCTSConfig.stages``)."""
        caps = _stage_caps(cfg.num_sims, cfg.stages)
        t = init_tree(game, cfg, roots, root_p, root_v,
                      capacity=K_base - 1 + caps[0])
        if carried is not None:
            t = _install_carried(t, carried[0], carried[1])
        trav = jnp.zeros((), jnp.int32)
        lo = 1
        for k, cap in enumerate(caps):
            hi = cap - 1 if k < len(caps) - 1 else cfg.num_sims
            t, trav = jax.lax.fori_loop(lo, hi + 1, body_fn, (t, trav))
            if k < len(caps) - 1:
                t = _grow(t, K_base - 1 + caps[k + 1])
            lo = hi + 1
        return t, trav

    if use_fused and (root_action_fn is not None or nonroot_scores is not None):
        raise NotImplementedError(
            "selection hooks are not supported by the fused kernel path")

    def _target_platform():
        # respect an active jax.default_device(...) context (the canary's
        # CPU-twin programs run under one on a TPU-default process)
        dev = jax.config.jax_default_device
        return dev.platform if dev is not None else jax.default_backend()

    # default engine is the XLA loop: the kernel measured slower END-TO-END
    # at every on-chip configuration (see MCTSConfig.descent); opt in with
    # descent="pallas" (plain PUCT only, TPU or interpret)
    use_pallas_descent = (
        cfg.descent == "pallas"
        and root_action_fn is None and nonroot_scores is None
        and not use_fused)

    def select(tree, i):
        """One full-batch descent: the Mosaic kernel on TPU (one staged
        slab pass, lanes-minor layout) for large-slab stages, the XLA
        while-loop otherwise.  The engine choice is static per stage:
        ``tree`` shapes are stage-compile-time constants."""
        if not (use_pallas_descent
                and tree.meta.shape[0] >= cfg.descent_min_cap):
            ra = None if root_action_fn is None else root_action_fn(tree, i)
            return _select(tree, eta, cfg, max_depth, A, ra, nonroot_scores)
        from ..ops import fused_mcts as FM
        out = FM.pallas_select(
            tree.stats, tree.prior_legal, tree.meta, eta.T,
            max_depth=max_depth, cpuct=cfg.cpuct, eps=cfg.dirichlet_eps,
            interpret=_target_platform() != "tpu")
        # adapt to the _SelectState consumers: `done` distinguishes
        # depth-capped lanes (neither expanded nor terminal) for
        # cap_leaf_value; cur_player/edge_moved/d are descent-internal
        meta_cur = _slab_gather(tree.meta, out.cur)
        done = (out.expand_parent >= 0) | (meta_cur[:, _TERMINAL] > 0.5)
        return _SelectState(
            cur=out.cur, cur_player=meta_cur[:, _PLAYER],
            edge_moved=jnp.zeros((B,), bool), done=done,
            expand_parent=out.expand_parent,
            expand_action=out.expand_action, depth=out.depth,
            path_nodes=out.path_nodes, path_actions=out.path_actions,
            path_r=out.r_edges, path_f=out.f_edges,
            d=jnp.zeros((), jnp.int32))

    if not use_fused:
        def sim_body(i, carry):
            tree, traversed = carry
            sel = select(tree, i)
            expanding = sel.expand_parent >= 0
            tree, child_states, leaf_value, parent_idx, exp_r, exp_f = expand(
                tree, i, sel.expand_parent, sel.expand_action)
            slot = K_base + i - 1
            leaf_value = cap_leaf_value(tree, sel, leaf_value)
            q_edges, on_path, nodes, actions = _edge_updates(
                sel, exp_r, exp_f, leaf_value, cfg, max_depth)
            stats = apply_update(
                tree.stats, nodes, actions, on_path, q_edges, expanding,
                parent_idx, sel.expand_action,
                jnp.full((B,), 0.0, jnp.float32) + (slot + 1.0))
            tree = tree._replace(stats=stats)
            return tree, traversed + jnp.sum(sel.depth)

        tree, traversed = run_staged(sim_body)
    else:
        from ..ops import pallas_update as PU

        interpret = jax.default_backend() != "tpu"

        def sim_body_fused(i, carry):
            tree, traversed = carry
            sel = _select(tree, eta, cfg, max_depth, A)
            expanding = sel.expand_parent >= 0
            tree, child_states, leaf_value, parent_idx, exp_r, exp_f = expand(
                tree, i, sel.expand_parent, sel.expand_action)
            slot = K_base + i - 1
            leaf_value = cap_leaf_value(tree, sel, leaf_value)
            q_edges, on_path, nodes, actions = _edge_updates(
                sel, exp_r, exp_f, leaf_value, cfg, max_depth)
            # pallas_update predates the round-5 lanes-minor flip and
            # keeps its [cap, B, S] contract; adapt by transposing (this
            # research path is not production — see MCTSConfig.fused)
            stats_bw = jnp.transpose(tree.stats, (0, 2, 1))
            stats_bw = PU.pallas_update(
                stats_bw, nodes, actions, sel.depth,
                jnp.where(on_path, q_edges, 0.0),
                jnp.where(expanding, parent_idx, -1), sel.expand_action,
                jnp.full((B,), 0.0, jnp.float32) + (slot + 1.0),
                interpret=interpret)
            tree = tree._replace(stats=jnp.transpose(stats_bw, (0, 2, 1)))
            return tree, traversed + jnp.sum(sel.depth)

        tree, traversed = run_staged(sim_body_fused)

    root_visits = tree.stats[0, ap:ap + A, :].T.astype(jnp.int32)
    ntot = jnp.sum(root_visits, -1, keepdims=True).astype(jnp.float32)
    policy = root_visits.astype(jnp.float32) / jnp.maximum(ntot, 1.0)
    root_q = tree.stats[0, :A, :].T / jnp.maximum(
        root_visits.astype(jnp.float32), 1.0)
    return SearchResults(
        policy=policy,
        root_visits=root_visits,
        root_q=root_q,
        root_value=tree.meta[0, _VALUE, :],
        nodes_traversed=traversed,
        tree=tree,
    )


# ---------------------------------------------------------------------------
# Stock oracles (``src/mcts.jl:28-72``)
# ---------------------------------------------------------------------------


def random_oracle(game: Game) -> Oracle:
    """Uniform prior, zero value (``MCTS.RandomOracle``, ``src/mcts.jl:62-72``)."""

    def fn(states, obs, mask):
        del states, obs
        p = mask.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
        return p, jnp.zeros(p.shape[:1], jnp.float32)

    return fn


def rollout_oracle(game: Game, gamma: float = 1.0,
                   rng_seed: int = 0,
                   max_plies: Optional[int] = None) -> Oracle:
    """Uniform prior; value from one random playout — the "vanilla MCTS"
    oracle (``MCTS.RolloutOracle``, ``src/mcts.jl:28-60``).

    The playout is a ``scan`` of masked random steps over the maximum game
    length, with rewards discounted from the evaluated state onward.

    ``max_plies`` truncates the playout: when set and the game has not ended
    after that many random plies, the leaf value is bootstrapped from
    ``game.heuristic_value`` squashed through tanh (white POV, discounted
    like a terminal reward).  This is a deviation from the reference's
    play-to-the-end oracle, used where the full-length playout scan exceeds
    this TPU worker's program envelope (mancala's 120-ply sowing scan
    reproducibly faults the worker at ANY lane count, while ≤42-ply scans
    are validated clean on-chip — NOTES.md round-4 re-bisect).
    """
    if (max_plies is not None and max_plies < game.max_game_length
            and game.heuristic_value is None):
        raise ValueError(
            f"rollout_oracle(max_plies={max_plies}) needs "
            f"game.heuristic_value to bootstrap truncated playouts")

    def fn(states, obs, mask):
        del obs
        B = mask.shape[0]
        p = mask.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1.0)
        # derive per-call randomness from the state contents so the oracle
        # stays a pure function: fold every state element into the key so
        # that distinct states never collide (a plain element-sum would
        # alias all states with the same stone multiset onto one rollout)
        def state_key(s):
            flat = jnp.concatenate([x.reshape(-1).astype(jnp.int32)
                                    for x in jax.tree.leaves(s)])
            k = jax.random.key(rng_seed)
            return jax.lax.fori_loop(
                0, flat.shape[0],
                lambda i, k: jax.random.fold_in(k, flat[i]), k)

        keys0 = jax.vmap(state_key)(states)

        def body(carry, _):
            s, disc, acc, keys = carry
            done = jax.vmap(game.terminated)(s)
            legal = jax.vmap(game.legal_mask)(s)
            keys, akeys, skeys = jax.vmap(
                lambda k: tuple(jax.random.split(k, 3)))(keys)
            a = jax.vmap(envcore.sample_from)(
                legal.astype(jnp.float32), akeys)
            s2 = jax.vmap(game.step)(s, a, skeys)
            r = jax.vmap(game.reward)(s2)
            acc = acc + jnp.where(done, 0.0, disc * r)
            disc = jnp.where(done, disc, disc * gamma)
            s2 = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            return (s2, disc, acc, keys), None

        init = (states, jnp.ones((B,), jnp.float32),
                jnp.zeros((B,), jnp.float32), keys0)
        length = game.max_game_length
        if max_plies is not None:
            length = min(max_plies, length)
        (s_end, disc, wr, _), _ = jax.lax.scan(
            body, init, None, length=length)
        if length < game.max_game_length:
            # heuristic bootstrap of unfinished playouts: current-player
            # heuristic -> white POV, squashed to the terminal-reward range
            alive = ~jax.vmap(game.terminated)(s_end)
            hv = jax.vmap(game.heuristic_value)(s_end)
            hv_white = jnp.where(
                jax.vmap(game.to_play)(s_end) == envcore.WHITE, hv, -hv)
            wr = wr + jnp.where(alive, disc * jnp.tanh(hv_white), 0.0)
        white = jax.vmap(game.to_play)(states) == envcore.WHITE
        return p, jnp.where(white, wr, -wr)

    return fn
