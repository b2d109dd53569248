"""Microbenchmark: per-simulation MCTS stats-update formulations.

The backprop update writes ``2*B*D + B`` scalars into the ``[cap, B, 3*AP]``
stats slab each simulation.  Measured on the v5e chip (NOTES.md), the flat
scatter-add costs ~20 ns/slot *inside* the simulation loop (~1.2-1.85 ms/sim
at flagship shapes) while a standalone scatter runs 50x faster — the scatter
is the dominant per-sim cost.  This benchmark compares formulations inside a
``fori_loop`` at flagship shapes:

* ``scatter``  — the production path: one flat scatter-add (unique indices).
* ``dense``    — one-hot **matmul** (rides the MXU): per-lane
  ``[D+1, cap+1] x [D+1, S]`` batched dot producing the full dense update,
  accumulated into a lane-major ``[B, cap, S]`` slab (no transpose).
* ``dense_t``  — same matmul, but transposed into the production node-major
  ``[cap, B, S]`` layout before the add (costs one slab transpose per sim).

All three compute identical updates (asserted on small shapes first).

Usage:  python -m alphazero_tpu.scripts.profile_update [--cap 601] [--b 1024]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(key, cap, B, D, A, ap):
    """Random plausible per-sim update operands."""
    ks = jax.random.split(key, 6)
    depth = jax.random.randint(ks[0], (B,), 1, D + 1)
    on_path = jnp.arange(D)[None, :] < depth[:, None]
    nodes = jnp.where(
        on_path, jax.random.randint(ks[1], (B, D), 0, cap), 0)
    actions = jnp.where(
        on_path, jax.random.randint(ks[2], (B, D), 0, A), 0)
    q_edges = jnp.where(on_path, jax.random.normal(ks[3], (B, D)), 0.0)
    parent = jax.random.randint(ks[4], (B,), 0, cap)
    pact = jax.random.randint(ks[5], (B,), 0, A)
    child_val = jnp.full((B,), 7.0, jnp.float32)
    return nodes, actions, on_path, q_edges, parent, pact, child_val


def scatter_update(stats, inp, ap):
    """Production formulation (search/mcts.py apply_update_xla);
    stats [cap, B, S]."""
    nodes, actions, on_path, q_edges, parent, pact, child_val = inp
    cap, B, S = stats.shape
    brange = jnp.arange(B)
    oob = cap * B * S
    base = (nodes * B + brange[:, None]) * S + actions
    idx_q = jnp.where(on_path, base, oob)
    idx_v = jnp.where(on_path, base + ap, oob)
    idx_c = (parent * B + brange) * S + 2 * ap + pact
    all_idx = jnp.concatenate([idx_q.reshape(-1), idx_v.reshape(-1), idx_c])
    all_upd = jnp.concatenate(
        [q_edges.reshape(-1), on_path.astype(jnp.float32).reshape(-1),
         child_val])
    return stats.reshape(-1).at[all_idx].add(
        all_upd, mode="drop", unique_indices=True).reshape(cap, B, S)


def dense_update(stats_bm, inp, ap, transpose_to=None):
    """One-hot matmul formulation.  ``stats_bm`` is ``[B, cap, S]`` unless
    ``transpose_to='node_major'`` (then ``[cap, B, S]`` with a per-sim
    transpose of the update).

    Rows 0..D-1 of the contraction are the path edges (qsum + visit
    columns); row D is the child-pointer install (exactly-once add)."""
    nodes, actions, on_path, q_edges, parent, pact, child_val = inp
    B, D = q_edges.shape
    if transpose_to == "node_major":
        cap, _, S = stats_bm.shape
    else:
        _, cap, S = stats_bm.shape
    A = ap  # padded action width == one column block

    # lhs: [B, D+1, cap+1] one-hot over destination node rows (bf16 feeds
    # the MXU; exact for 0/1).  Off-path edges target the padding row.
    node_rows = jnp.concatenate(
        [jnp.where(on_path, nodes, cap), parent[:, None]], axis=1)
    lhs = (node_rows[:, :, None] ==
           jnp.arange(cap + 1)[None, None, :]).astype(jnp.bfloat16)

    # rhs: [B, D+1, S] per-edge column payloads
    a_onehot = (actions[:, :, None] ==
                jnp.arange(A)[None, None, :]).astype(jnp.float32)
    qcols = a_onehot * q_edges[:, :, None]
    vcols = a_onehot * on_path.astype(jnp.float32)[:, :, None]
    ccols = jnp.zeros((B, D, S - 2 * A), jnp.float32)
    rows_d = jnp.concatenate([qcols, vcols, ccols], axis=-1)
    c_onehot = (pact[:, None] == jnp.arange(A)[None, :]).astype(jnp.float32)
    row_child = jnp.concatenate(
        [jnp.zeros((B, 2 * A)), c_onehot * child_val[:, None],
         jnp.zeros((B, S - 3 * A))], axis=-1)
    rhs = jnp.concatenate([rows_d, row_child[:, None, :]], axis=1)

    upd = jax.lax.dot_general(
        lhs, rhs.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [B, cap+1, S]
    upd = upd[:, :cap, :]
    if transpose_to == "node_major":
        return stats_bm + jnp.transpose(upd, (1, 0, 2))
    return stats_bm + upd


def check_parity():
    cap, B, D, A, ap = 33, 16, 11, 7, 8
    S = 3 * ap
    inp = make_inputs(jax.random.key(0), cap, B, D, A, ap)
    stats = jnp.zeros((cap, B, S))
    ref = scatter_update(stats, inp, ap)
    got = dense_update(jnp.zeros((B, cap, S)), inp, ap)
    np.testing.assert_allclose(np.asarray(ref),
                               np.transpose(np.asarray(got), (1, 0, 2)),
                               atol=2e-2, rtol=1e-2)
    got_t = dense_update(stats, inp, ap, transpose_to="node_major")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got_t),
                               atol=2e-2, rtol=1e-2)
    print("parity ok (scatter == dense == dense_t)")


def bench(name, fn, stats0, inputs, iters):
    @jax.jit
    def run(stats, keyseed):
        def body(i, st):
            inp = jax.tree.map(lambda x: x[i], inputs)
            return fn(st, inp)
        return jax.lax.fori_loop(0, iters, body, stats)

    run(stats0, 0).block_until_ready()  # compile
    t0 = time.perf_counter()
    r = run(stats0, 0)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s}: {dt*1e3:8.3f} ms/sim")
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cap", type=int, default=601)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--d", type=int, default=43)
    p.add_argument("--a", type=int, default=7)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)
    ap = ((args.a + 7) // 8) * 8
    S = 3 * ap
    check_parity()

    keys = jax.random.split(jax.random.key(1), args.iters)
    inputs = jax.vmap(functools.partial(
        make_inputs, cap=args.cap, B=args.b, D=args.d, A=args.a, ap=ap))(keys)

    stats_nm = jnp.zeros((args.cap, args.b, S))
    stats_bm = jnp.zeros((args.b, args.cap, S))
    bench("scatter", lambda st, i: scatter_update(st, i, ap),
          stats_nm, inputs, args.iters)
    bench("dense", lambda st, i: dense_update(st, i, ap),
          stats_bm, inputs, args.iters)
    bench("dense_t", lambda st, i: dense_update(
        st, i, ap, transpose_to="node_major"), stats_nm, inputs, args.iters)


if __name__ == "__main__":
    main()
