"""Chip-integrity canary: validate device programs before trusting numbers.

Round 2/3 uncovered three independent silent-miscompilation faults on the
target TPU worker (NOTES.md): an int8 scatter dropping ~70% of batched
updates at >=1024 lanes, the minmax full-width-expansion program being
silently weakened (which inflated every round-2 vs-minmax result), and a
shape-dependent worker abort in large rollout-search programs.  The moral
("baselines must be continuously re-validated against ground truth") is
enforced here as a mechanism: ``validate_chip()`` runs the production
device-program families on pinned inputs and compares them against the
in-process CPU backend, which has been correct throughout.  No reference
equivalent exists (the closest in spirit is ``test_grad_updates.jl``'s
pre-run OOM canary); this hardware demands it.

Checks:

* ``env_step``     — 1024-lane connect-four select-based env steps
                     (the int8-scatter fault class) TPU vs CPU, bit-exact.
* ``i8_scatter``   — the quarantined scatter formulation itself, recorded
                     as ``known_fault_present`` (informational: production
                     no longer emits it; the canary does not fail on it).
* ``minmax``       — depth-5 amplified minmax Q-values on 64 pinned
                     positions, TPU vs CPU (argmax moves exact, Q close).
* ``search``       — a 128-lane x 96-sim uniform-oracle PUCT search,
                     TPU vs CPU (root visit counts exact, W close).
* ``rollout_guard``— host-only: the duel lane guard still chunks the known
                     crashing rollout shapes under ROLLOUT_LANE_BUDGET.

Wired into ``Session.resume()``, ``bench.py`` and ``final_eval`` so every
headline number carries a canary verdict.  Results are cached per process
(the programs are also cached in the persistent XLA compile cache, so
steady-state cost is a few seconds).  Set ``AZ_SKIP_CANARY=1`` to skip
(e.g. CPU-only CI), ``AZ_CANARY=strict`` to also fail on the known
quarantined scatter fault.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, NamedTuple, Optional

import numpy as np


class CheckResult(NamedTuple):
    name: str
    ok: bool
    detail: str
    seconds: float


class CanaryError(RuntimeError):
    pass


_CACHE: Dict[str, List[CheckResult]] = {}


def _cpu():
    import jax
    return jax.devices("cpu")[0]


def _default_is_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _on(device, fn, *args):
    """jit + run ``fn`` on ``device``, fetching results to host."""
    import jax
    args = jax.device_put(args, device)
    with jax.default_device(device):
        out = jax.jit(fn)(*args)
        return jax.tree.map(np.asarray, out)


def _pinned_c4_states(n: int, depth: int, seed: int):
    """Deterministic batch of reachable connect-four states (host-built)."""
    from ..envs import registry
    game = registry()["connect-four"]
    rng = np.random.RandomState(seed)
    boards = np.zeros((n, 6, 7), np.int8)
    players = np.zeros((n,), np.int8)
    for b in range(n):
        d = rng.randint(depth // 2, depth + 1)
        board = np.zeros((6, 7), np.int8)
        player = 0
        for _ in range(d):
            cols = [c for c in range(7) if board[5, c] == 0]
            c = cols[rng.randint(len(cols))]
            r = int(np.argmax(board[:, c] == 0))
            board[r, c] = player + 1
            if _four_at(board, r, c):  # avoid terminal states
                board[r, c] = 0
                continue
            player = 1 - player
        boards[b], players[b] = board, player
    return game, boards, players


def _four_at(b, row, col):
    me = b[row, col]
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        k = 1
        for s in (1, -1):
            r, c = row + s * dr, col + s * dc
            while 0 <= r < 6 and 0 <= c < 7 and b[r, c] == me:
                k += 1
                r += s * dr
                c += s * dc
        if k >= 4:
            return True
    return False


def _make_states(game, boards, players):
    import jax
    import jax.numpy as jnp
    s0 = game.init()
    B = boards.shape[0]
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), s0)
    return batch._replace(board=jnp.asarray(boards),
                          player=jnp.asarray(players, batch.player.dtype))


# ---- individual checks --------------------------------------------------

def _check_env_step(dev) -> CheckResult:
    """16 chained random env steps at 1024 lanes: TPU vs CPU bit-exact."""
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    game, boards, players = _pinned_c4_states(1024, 6, seed=11)
    states = _make_states(game, boards, players)

    def program(states, key):
        def body(carry, k):
            s = carry
            mask = jax.vmap(game.legal_mask)(s)
            done = jax.vmap(game.terminated)(s)
            a = jax.random.categorical(k, jnp.where(mask, 0.0, -1e9))
            ks = jax.random.split(jax.random.fold_in(k, 1),
                                  a.shape[0])
            s2 = jax.vmap(game.step)(s, a, ks)
            s = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                s2, s)
            return s, None
        out, _ = jax.lax.scan(body, states, jax.random.split(key, 16))
        return out.board, out.player

    key = jax.random.key(7)
    got = _on(dev, program, states, key)
    want = _on(_cpu(), program, states, key)
    same = all((a == b).all() for a, b in zip(got, want))
    nbad = int((got[0] != want[0]).any(axis=(1, 2)).sum()) if not same else 0
    return CheckResult("env_step", bool(same),
                       "bit-exact at 1024 lanes" if same else
                       f"{nbad}/1024 lanes diverge from CPU",
                       time.time() - t0)


def _check_i8_scatter(dev) -> CheckResult:
    """The quarantined int8 scatter op-class (informational)."""
    from ..scripts.repro_i8_scatter import trial
    t0 = time.time()
    bad = trial(1024, np.int8, "scatter")
    present = bad > 0
    return CheckResult(
        "i8_scatter", True,
        (f"known_fault_present ({bad}/1024 updates dropped; production "
         "uses selects)") if present else "scatter correct at 1024 lanes",
        time.time() - t0)


def _check_minmax(dev) -> CheckResult:
    """Depth-5 amplified minmax on 64 pinned positions: TPU vs CPU."""
    t0 = time.time()
    from .. import minmax as mm
    game, boards, players = _pinned_c4_states(64, 12, seed=23)
    states = _make_states(game, boards, players)

    def program(states):
        import jax
        qs = mm._qvalues(game, states, 5, True, 1.0)
        legal = jax.vmap(game.legal_mask)(states)
        return qs, legal

    got_q, legal = _on(dev, program, states)
    want_q, _ = _on(_cpu(), program, states)
    gq = np.where(legal, got_q, -np.inf)
    wq = np.where(legal, want_q, -np.inf)
    moves_ok = (gq.argmax(-1) == wq.argmax(-1)).all()
    finite = np.isfinite(wq) & np.isfinite(gq)
    d = np.zeros_like(gq)
    np.subtract(gq, wq, out=d, where=finite)
    qdiff = float(np.abs(d).max())
    amp_ok = (np.isfinite(gq) == np.isfinite(wq)).all() and \
        ((np.sign(gq) == np.sign(wq)) | ~np.isinf(wq)).all()
    ok = bool(moves_ok and amp_ok and qdiff < 1e-4)
    nbad = int((gq.argmax(-1) != wq.argmax(-1)).sum())
    return CheckResult(
        "minmax", ok,
        f"argmax parity 64/64, max|dQ|={qdiff:.2e}" if ok else
        f"{nbad}/64 argmax moves diverge from CPU (max|dQ|={qdiff:.2e})",
        time.time() - t0)


def _check_search(dev) -> CheckResult:
    """128-lane x 96-sim uniform-prior PUCT search: TPU vs CPU."""
    import jax
    t0 = time.time()
    from ..search import mcts as M
    game, boards, players = _pinned_c4_states(128, 8, seed=37)
    states = _make_states(game, boards, players)
    cfg = M.MCTSConfig(num_sims=96, cpuct=2.0, dirichlet_eps=0.25,
                       dirichlet_alpha=1.0)

    def program(states, key):
        res = M.search(game, M.random_oracle(game), states, key, cfg)
        return res.root_visits, res.root_q

    key = jax.random.key(5)
    got_n, got_q = _on(dev, program, states, key)
    want_n, want_q = _on(_cpu(), program, states, key)
    n_ok = (got_n == want_n).all()
    qdiff = float(np.abs(got_q - want_q).max())
    ok = bool(n_ok and qdiff < 1e-4)
    nbad = int((got_n != want_n).any(axis=-1).sum())
    return CheckResult(
        "search", ok,
        f"visit parity 128/128, max|dQ|={qdiff:.2e}" if ok else
        f"{nbad}/128 lanes' visit counts diverge (max|dQ|={qdiff:.2e})",
        time.time() - t0)


def _check_rollout_guard(dev) -> CheckResult:
    """Host-only: the known crashing rollout shapes stay chunked."""
    t0 = time.time()
    from .. import arena
    from .. import config as cfgmod
    from ..envs import registry
    sim = cfgmod.SimParams(num_games=256, num_lanes=256)
    spec = arena.MctsRollouts(cfgmod.MctsParams(num_iters_per_turn=1000))
    safe = arena.rollout_safe_sim(sim, spec, game=registry()["connect-four"])
    ok = (safe.num_lanes * 1000 <= arena.ROLLOUT_LANE_BUDGET
          and safe.num_games == sim.num_games)
    return CheckResult(
        "rollout_guard", bool(ok),
        f"1000-sim/256-game duel -> {safe.num_lanes} lanes "
        f"(budget {arena.ROLLOUT_LANE_BUDGET})",
        time.time() - t0)


# ---- public API ---------------------------------------------------------

def validate_chip(force: bool = False) -> Optional[List[CheckResult]]:
    """Run all checks against the default device.  Returns None when skipped
    (CPU-only runtime or ``AZ_SKIP_CANARY=1``); raises :class:`CanaryError`
    on failure; returns the check list on success (cached per process)."""
    if os.environ.get("AZ_SKIP_CANARY") == "1":
        return None
    if not _default_is_tpu() and not force:
        return None
    import jax
    dev = jax.devices()[0]
    key = str(dev)
    if key in _CACHE:
        return _CACHE[key]
    checks = [_check_rollout_guard, _check_i8_scatter, _check_env_step,
              _check_minmax, _check_search]
    results = [c(dev) for c in checks]
    bad = [r for r in results if not r.ok]
    strict = os.environ.get("AZ_CANARY") == "strict"
    if strict:
        bad += [r for r in results
                if r.name == "i8_scatter" and "known_fault" in r.detail]
    if bad:
        lines = "\n".join(f"  {r.name}: {r.detail}" for r in bad)
        raise CanaryError(
            f"chip-integrity canary FAILED on {dev}:\n{lines}\n"
            "Device programs diverge from the CPU reference — any number "
            "produced on this chip is untrustworthy (see NOTES.md round-3 "
            "fault history).  Set AZ_SKIP_CANARY=1 to bypass at your own "
            "risk.")
    _CACHE[key] = results
    return results


def summary(results: Optional[List[CheckResult]]) -> str:
    if results is None:
        return "skipped"
    total = sum(r.seconds for r in results)
    flags = [r.detail for r in results if "known_fault" in r.detail]
    base = f"pass ({len(results)} checks, {total:.1f}s)"
    return base + (f"; {'; '.join(flags)}" if flags else "")
