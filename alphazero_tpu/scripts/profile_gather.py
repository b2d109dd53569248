"""Microbenchmark: per-step descent gathers — three slabs vs one combined.

The MCTS descent reads, per while-loop step and per lane, one node row from
each of three slabs (stats 3*AP, prior_legal 2*AP, meta 8).  Measured on
the v5e these row gathers are latency-bound (~35 us per gather op, far off
the HBM bandwidth roofline), which makes the *count* of gather ops per step
the knob: a single combined [N, B, 48] slab would read the same bytes in
one op.  This bench measures a descent-shaped loop (gather -> cheap compute
-> index feedback) in the two layouts at flagship shapes.

Usage: python -m alphazero_tpu.scripts.profile_gather [--n 601] [--b 1024]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def _row_gather(x, idx):
    B = x.shape[1]
    return jax.vmap(lambda i, b: x[i, b])(idx, jnp.arange(B))


def bench(name, step_fn, state, steps, iters):
    @jax.jit
    def run(state):
        def body(i, carry):
            idx, acc = carry
            idx, acc = step_fn(idx, acc)
            return idx, acc
        return jax.lax.fori_loop(0, steps, body, state)

    jax.block_until_ready(run(state))
    t0 = time.perf_counter()
    jax.block_until_ready(run(state))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:12s}: {dt*1e6:9.1f} us/step")
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=601)
    p.add_argument("--b", type=int, default=1024)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args(argv)
    N, B = args.n, args.b
    ap = 8
    k = jax.random.key(0)
    stats = jax.random.normal(k, (N, B, 3 * ap))
    prior = jax.random.normal(k, (N, B, 2 * ap))
    meta = jax.random.normal(k, (N, B, 8))
    combined = jnp.concatenate([meta, prior, stats], axis=-1)  # [N, B, 48]

    def feedback(row, acc):
        """cheap compute producing the next per-lane index (data-dependent,
        so the gathers can't be hoisted)"""
        nxt = (jnp.abs(row[:, :ap]).argmax(-1).astype(jnp.int32)
               + acc.astype(jnp.int32)) % N
        return nxt, acc + 1

    def three(idx, acc):
        s = _row_gather(stats, idx)
        pl_ = _row_gather(prior, idx)
        m = _row_gather(meta, idx)
        row = jnp.concatenate([s[:, :ap] + pl_[:, :ap], m[:, :ap]], -1)
        return feedback(row, acc)

    def one(idx, acc):
        c = _row_gather(combined, idx)
        row = jnp.concatenate(
            [c[:, 24:24 + ap] + c[:, 8:8 + ap], c[:, :ap]], -1)
        return feedback(row, acc)

    state = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32))
    bench("three-slabs", three, state, args.steps, 1)
    bench("one-slab", one, state, args.steps, 1)


if __name__ == "__main__":
    main()
