"""Pallas TPU kernel: the MCTS in-tree descent (select phase).

The profiled cost of the XLA search loop (see ``search/mcts.py``) is
dominated by the gather-heavy PUCT descent — up to ``max_depth`` sequential
while-iterations, each issuing several cross-lane gathers whose per-op
latency adds up.  This kernel runs the *entire* descent of all lanes in one
launch: per grid step a lane-block of the three node slabs is staged through
VMEM, and the walk is pure vector work — node rows are fetched with one-hot
masked reductions over the node axis, and per-lane paths are accumulated in
register-carried ``(D, LB)`` arrays (no dynamic VMEM indexing, which Mosaic
cannot lane-align).  Everything is laid out lanes-minor (``(X, LB)``) so
per-lane state costs one vector register row per 128 lanes.

While walking, the kernel also records the per-edge rewards and player-switch
sign factors needed by the closed-form backprop (``search/mcts.py:_q_chain``)
— it visits exactly those nodes anyway — so the XLA side needs no extra
gathers.  The statistics update remains the XLA-side fused scatter (scalar
scatter inside a Mosaic kernel needs scalar-prefetch machinery; candidate for
a future iteration).

Validated bit-for-bit against the XLA path in tests/test_fused_mcts.py.

STATUS — measured break-even at flagship sizes in round 1, and the
round-2 re-analysis after ``MCTSConfig.gather="onehot"`` became the
production default (830 → 1027 samples/s: the kernel's own lookup
formulation, hoisted into the XLA loop, beat the XLA gather's ~40 us/step
fixed latency).  Revised economics vs that new baseline:

* XLA one-hot descent: every step re-streams the staged slabs from HBM —
  ~66 MB/step at average staged capacity, ~6-16 steps/sim.
* this kernel: ONE slab pass per sim (~0.15 ms at N=601/B=1024) staged
  into VMEM, then per-step one-hot reductions at VPU rate (~15 us/step).

Projected gain ≈ 0.2-0.3 ms/sim ⇒ ~1200 samples/s end-to-end, BUT the
kernel requires the lanes-minor ``[N, W, B]`` slab layout while the
production tree is ``[N, B, W]``; a per-sim transpose costs ~0.2 ms and
erases the win.  Landing it therefore means flipping the whole tree
layout (expansion DUS writes stay major-axis-contiguous in ``[N, W, B]``,
so this is plausible — it is the backlog's designed next step, touching
``_slab_gather``/``init_tree``/``expand``/``apply_update_dense``/
``advance_root`` with the existing bit-parity suite as the net).  Until
that lands the kernel stays a bit-validated experiment
(tests/test_fused_mcts.py), with the one-hot lookup already productionized
on the XLA side.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured consts


class SelectOut(NamedTuple):
    expand_parent: jnp.ndarray  # [B] i32 (-1: no expansion)
    expand_action: jnp.ndarray  # [B] i32
    cur: jnp.ndarray            # [B] i32 final node of the descent
    depth: jnp.ndarray          # [B] i32 edges recorded
    path_nodes: jnp.ndarray     # [B, D] i32
    path_actions: jnp.ndarray   # [B, D] i32
    r_edges: jnp.ndarray        # [B, D] f32 (expansion edge left 0)
    f_edges: jnp.ndarray        # [B, D] f32 sign factors (expansion edge 1)


def _pick_lanes_per_block(B: int, bytes_per_lane: int,
                          budget: int = 16 * 2**20) -> int:
    """Largest lane-block within ``budget`` that the TPU lowering accepts.

    Constraint (Mosaic): the minor (lane) block dim must be a multiple of
    128 OR the full batch.  The kernel declares a 100 MB VMEM need via
    CompilerParams, so ``budget`` is a pipelining preference (smaller
    blocks double-buffer; one full-batch block runs grid-1 unbuffered),
    not a correctness bound — 128 stays legal even when it exceeds it.
    """
    if B <= 128 or B % 128 != 0:
        return B
    lb = 128
    while lb * 2 <= B and B % (lb * 2) == 0 and \
            (lb * 2) * bytes_per_lane <= budget:
        lb *= 2
    return lb


def _kernel(ap: int, max_depth: int, cpuct: float, eps: float,
            N: int, LB: int,
            stats_in, pl_in, meta_in, eta_in,
            par_out, act_out, cur_out, dep_out, pn_out, pa_out,
            re_out, fe_out):
    D = max_depth
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1, LB), 0)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (ap, LB), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (D, LB), 0)
    eta = eta_in[...]                       # [ap, LB]
    stats = stats_in[...]                   # [N, 3ap, LB]
    plegal = pl_in[...]                     # [N, 2ap, LB]
    meta = meta_in[...]                     # [N, 8, LB]

    def row(slab, cur):
        """one-hot gather of each lane's ``cur`` row: [W, LB]."""
        oh = (iota_n == cur[None]).astype(jnp.float32)   # [N, 1, LB]
        return jnp.sum(slab * oh, axis=0)

    def field(mat, k):
        """Extract row ``k`` of ``mat [W, LB]`` as [1, LB] with a canonical
        vector layout (a direct ``mat[k:k+1]`` slice would carry a sublane
        offset that Mosaic cannot reconcile across while-loop carries)."""
        sel = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0) == k
        return jnp.sum(jnp.where(sel, mat, 0.0), axis=0, keepdims=True)

    def cc(x):
        """Force a concrete (non-replicated) vector layout: Mosaic cannot
        legalize while-loop yields whose operands mix replicated and
        concrete sublane layouts.  (Carries are all numeric; i1 vectors
        additionally hit unsupported truncations.)"""
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        return jnp.where(lane < 0, x + jnp.ones((), x.dtype), x)

    def ccC(c):
        return C(c.d, cc(c.cur), cc(c.player), cc(c.done), cc(c.parent),
                 cc(c.eaction), cc(c.depth), cc(c.pn), cc(c.pa), cc(c.re),
                 cc(c.fe))

    class C(NamedTuple):
        d: jnp.ndarray
        cur: jnp.ndarray         # [1, LB] i32
        player: jnp.ndarray      # [1, LB] f32
        done: jnp.ndarray        # [1, LB] i32 (0/1)
        parent: jnp.ndarray      # [1, LB] i32
        eaction: jnp.ndarray     # [1, LB] i32
        depth: jnp.ndarray       # [1, LB] i32
        pn: jnp.ndarray          # [D, LB] i32 (register-carried path)
        pa: jnp.ndarray          # [D, LB] i32
        re: jnp.ndarray          # [D, LB] f32
        fe: jnp.ndarray          # [D, LB] f32

    init = C(d=jnp.zeros((), jnp.int32),
             cur=jnp.zeros((1, LB), jnp.int32),
             player=field(meta[0], 0),
             done=(field(meta[0], 1) > 0.5).astype(jnp.int32),
             parent=jnp.full((1, LB), -1, jnp.int32),
             eaction=jnp.zeros((1, LB), jnp.int32),
             depth=jnp.zeros((1, LB), jnp.int32),
             pn=jnp.full((D, LB), -1, jnp.int32),
             pa=jnp.zeros((D, LB), jnp.int32),
             re=jnp.zeros((D, LB), jnp.float32),
             fe=jnp.ones((D, LB), jnp.float32))

    def cond(c):
        return jnp.logical_and(jnp.any(c.done == 0), c.d < D)

    def body(c):
        srow = row(stats, c.cur)             # [3ap, LB]
        plrow = row(plegal, c.cur)           # [2ap, LB]
        qsum = srow[:ap]
        nvis = srow[ap:2 * ap]
        childp1 = srow[2 * ap:]
        p = plrow[:ap]
        legal = plrow[ap:] > 0.5
        if eps > 0:
            is_root = c.cur == 0             # [1, LB]
            p = jnp.where(is_root, (1.0 - eps) * p + eps * eta, p)
        q = qsum / jnp.maximum(nvis, 1.0)
        sqrt_ntot = jnp.sqrt(jnp.sum(nvis, axis=0, keepdims=True))
        scores = jnp.where(legal, q + cpuct * p * sqrt_ntot / (nvis + 1.0),
                           NEG_INF)
        # first-max-wins argmax, spelled out: Mosaic's argmax lowering does
        # NOT break exact-score ties at the lowest index the way XLA's
        # argmax does, and uniform-prior searches tie constantly (observed
        # on-chip: 22/128 canary lanes diverged through tie-breaks alone)
        m = jnp.max(scores, axis=0, keepdims=True)
        action = jnp.min(jnp.where(scores >= m, iota_a, ap),
                         axis=0, keepdims=True).astype(jnp.int32)
        a_oh = (iota_a == action).astype(jnp.float32)
        child = jnp.sum(childp1 * a_oh, axis=0, keepdims=True) - 1.0
        child = child.astype(jnp.int32)      # [1, LB], -1 = unexpanded
        active = c.done == 0                 # [1, LB] bool (local)
        at_d = iota_d == c.d                 # [D, LB]
        pn = jnp.where(at_d & active, c.cur, c.pn)
        pa = jnp.where(at_d & active, action, c.pa)
        depth = c.depth + active.astype(jnp.int32)
        needs_expand = active & (child < 0)
        parent = jnp.where(needs_expand, c.cur, c.parent)
        eaction = jnp.where(needs_expand, action, c.eaction)
        mrow = row(meta, jnp.maximum(child, 0))   # [8, LB]
        child_player = field(mrow, 0)
        child_terminal = field(mrow, 1) > 0.5
        r_white = field(mrow, 2)
        descending = active & ~needs_expand
        r = jnp.where(c.player == 0.0, r_white, -r_white)
        f = jnp.where(c.player == child_player, 1.0, -1.0)
        re = jnp.where(at_d & descending, r, c.re)
        fe = jnp.where(at_d & descending, f, c.fe)
        done = ((c.done > 0) | needs_expand
                | (active & child_terminal)).astype(jnp.int32)
        cur = jnp.where(descending, child, c.cur)
        player = jnp.where(descending, child_player, c.player)
        return C(c.d + 1, cur, player, done, parent, eaction, depth,
                 pn, pa, re, fe)

    final = jax.lax.while_loop(cond, lambda c: ccC(body(c)), ccC(init))
    par_out[...] = final.parent
    act_out[...] = final.eaction
    cur_out[...] = final.cur
    dep_out[...] = final.depth
    pn_out[...] = final.pn
    pa_out[...] = final.pa
    re_out[...] = final.re
    fe_out[...] = final.fe


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "cpuct", "eps", "interpret",
                     "lanes_per_block"))
def pallas_select(stats, prior_legal, meta, eta_t, *, max_depth: int,
                  cpuct: float, eps: float,
                  interpret: bool = False,
                  lanes_per_block: Optional[int] = None) -> SelectOut:
    """Run one batched PUCT descent over the whole lane batch.

    Slabs are ``[N, W, B]`` lanes-minor; ``eta_t`` is ``[A, B]``
    (transposed).  Returns lane-major results (paths ``[B, D]``).

    ``lanes_per_block`` overrides the VMEM-budgeted block pick (TPU blocks
    must keep the lane (minor) dim a multiple of 128 or the full batch;
    at flagship N=601 a 128-lane block is 14.8 MB, which double-buffered
    exceeds the default 16 MB scoped-VMEM limit — raise it with
    ``--xla_tpu_scoped_vmem_limit_kib`` or chunk the batch per call).
    """
    N, S, B = stats.shape
    ap = S // 3
    PW = prior_legal.shape[1]
    MW = meta.shape[1]
    D = max_depth
    if eta_t.shape[0] != ap:  # pad to the action width (TPU block tiling)
        eta_t = jnp.pad(eta_t, ((0, ap - eta_t.shape[0]), (0, 0)))
    bytes_per_lane = N * (S + PW + MW) * 4
    LB = (lanes_per_block if lanes_per_block is not None
          else _pick_lanes_per_block(B, bytes_per_lane))
    grid = (B // LB,)

    kern = functools.partial(_kernel, ap, D, cpuct, eps, N, LB)
    lane2 = lambda g: (0, g)
    slab = lambda g: (0, 0, g)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, S, LB), slab),
            pl.BlockSpec((N, PW, LB), slab),
            pl.BlockSpec((N, MW, LB), slab),
            pl.BlockSpec((ap, LB), lane2),
        ],
        out_specs=[
            pl.BlockSpec((1, LB), lane2),
            pl.BlockSpec((1, LB), lane2),
            pl.BlockSpec((1, LB), lane2),
            pl.BlockSpec((1, LB), lane2),
            pl.BlockSpec((D, LB), lane2),
            pl.BlockSpec((D, LB), lane2),
            pl.BlockSpec((D, LB), lane2),
            pl.BlockSpec((D, LB), lane2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
        ],
        # the double-buffered 128-lane block at flagship N=601 is ~29.5 MB,
        # over XLA's default 16 MB scoped-VMEM budget; declare the kernel's
        # own VMEM need so every enclosing jit compiles without needing a
        # global --xla_tpu_scoped_vmem_limit_kib override
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(stats, prior_legal, meta, eta_t)
    (par, act, cur, dep, pn, pa, re, fe) = out
    return SelectOut(
        expand_parent=par[0], expand_action=act[0],
        cur=cur[0], depth=dep[0],
        path_nodes=pn.T, path_actions=pa.T,
        r_edges=re.T, f_edges=fe.T)
