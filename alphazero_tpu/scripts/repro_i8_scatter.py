"""Minimal repro: batched per-lane int8 scatter miscompiles on TPU.

Found round 3 while bisecting self-play data corruption (NOTES.md): a
vmapped 2-D scatter ``board.at[row, col].set(cell)`` over ``int8[B, 6, 7]``
boards silently DROPS ~70% of the updates on the axon TPU worker when
``B >= 1024`` (B <= 768 is correct; int32 scatters and select/one-hot
formulations are correct at every size).  In production this made ~27-40%
of connect-four self-play moves no-ops — games froze mid-board, the env
never terminated them, and the replay filled with duplicated states — which
silently flattened the training targets (the round-2 strength gap).

The framework no longer emits this op (env steps use masked selects, see
``envs/connect_four.py:_step``); this repro pins the fault for XLA triage
and serves as the canary if the workaround is ever removed.

Usage: python -m alphazero_tpu.scripts.repro_i8_scatter [--lanes 1024]
"""

from __future__ import annotations

import argparse


def trial(B: int, dtype, mode: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    boards = np.zeros((B, 6, 7), dtype)
    for b in range(B):
        for c in range(7):
            h = rng.randint(0, 7)
            boards[b, :h, c] = rng.randint(1, 3, h)
    acts = np.array(
        [rng.choice([c for c in range(7)
                     if (boards[b, :, c] != 0).sum() < 6])
         for b in range(B)], np.int32)
    rows = np.array([(boards[b, :, acts[b]] != 0).sum()
                     for b in range(B)], np.int32)
    cells = rng.randint(1, 3, B).astype(dtype)
    jb, ja, jr, jc = map(jnp.asarray, (boards, acts, rows, cells))
    if mode == "scatter":
        f = jax.jit(jax.vmap(lambda b, r, a, c: b.at[r, a].set(c)))
    else:  # the select formulation production uses
        def one(b, r, a, c):
            hit = ((jnp.arange(6)[:, None] == r)
                   & (jnp.arange(7)[None, :] == a))
            return jnp.where(hit, c, b)
        f = jax.jit(jax.vmap(one))
    new = np.asarray(f(jb, jr, ja, jc))
    bad = 0
    for b in range(B):
        exp = boards[b].copy()
        exp[rows[b], acts[b]] = cells[b]
        bad += not (exp == new[b]).all()
    return bad


def main(argv=None):
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    args = ap.parse_args(argv)
    B = args.lanes
    for dtype, name in ((np.int8, "int8"), (np.int32, "int32")):
        for mode in ("scatter", "select"):
            bad = trial(B, dtype, mode)
            print(f"B={B} {name} {mode}: {bad} corrupted boards"
                  + ("   <-- FAULT" if bad else ""))


if __name__ == "__main__":
    main()
