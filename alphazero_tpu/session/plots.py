"""Training and benchmark plots.

Re-design of ``/root/reference/src/ui/plots.jl``: per-iteration loss
decomposition, arena checkpoints, entropies, exploration depth and benchmark
win-rate curves, rendered from the session's JSON reports with matplotlib
(Agg backend, PNG output into ``<dir>/plots``).
"""

from __future__ import annotations

import json
import os
from typing import List

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _load_reports(session_dir: str) -> List[dict]:
    rdir = os.path.join(session_dir, "reports")
    if not os.path.isdir(rdir):
        return []
    files = sorted(os.listdir(rdir),
                   key=lambda s: int(s.split("_")[1].split(".")[0]))
    out = []
    for fn in files:
        with open(os.path.join(rdir, fn)) as f:
            out.append((int(fn.split("_")[1].split(".")[0]), json.load(f)))
    return out


def plot_training(session_dir: str) -> None:
    """Loss / entropy / perf curves (``plots.jl:164-253``)."""
    reports = _load_reports(session_dir)
    if not reports:
        return
    pdir = os.path.join(session_dir, "plots")
    os.makedirs(pdir, exist_ok=True)
    iters = [i for i, _ in reports]

    def series(path):
        vals = []
        for _, r in reports:
            cur = r
            try:
                for k in path:
                    cur = cur[k]
                vals.append(cur)
            except (KeyError, TypeError):
                vals.append(None)
        return vals

    # loss decomposition over iterations
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for comp in ["L", "Lp", "Lv", "Lreg", "Linv"]:
        ax.plot(iters, series(["learning", "initial_status", "loss", comp]),
                marker="o", ms=3, label=comp)
    ax.set_xlabel("iteration"); ax.set_ylabel("loss")
    ax.set_title("Loss decomposition (before learning)")
    ax.legend(); ax.grid(alpha=0.3)
    fig.tight_layout(); fig.savefig(os.path.join(pdir, "loss.png"), dpi=120)
    plt.close(fig)

    # entropies
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(iters, series(["learning", "initial_status", "Hp"]),
            marker="o", ms=3, label="Hp (MCTS)")
    ax.plot(iters, series(["learning", "initial_status", "Hpnet"]),
            marker="o", ms=3, label="Hpnet (network)")
    ax.set_xlabel("iteration"); ax.set_ylabel("policy entropy")
    ax.legend(); ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(pdir, "entropies.png"), dpi=120)
    plt.close(fig)

    # exploration depth + samples/s
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.plot(iters, series(["self_play", "average_exploration_depth"]),
             marker="o", ms=3)
    ax1.set_title("exploration depth"); ax1.grid(alpha=0.3)
    ax2.plot(iters, series(["self_play", "samples_gen_speed"]),
             marker="o", ms=3)
    ax2.set_title("self-play samples/s"); ax2.grid(alpha=0.3)
    for a in (ax1, ax2):
        a.set_xlabel("iteration")
    fig.tight_layout()
    fig.savefig(os.path.join(pdir, "perf.png"), dpi=120)
    plt.close(fig)

    # arena (gating) curve
    avgr = []
    for _, r in reports:
        cks = (r.get("learning") or {}).get("checkpoints") or []
        avgr.append(cks[-1]["evaluation"]["avgr"] if cks and
                    cks[-1].get("evaluation") else None)
    if any(v is not None for v in avgr):
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(iters, avgr, marker="o", ms=3)
        ax.axhline(0, color="gray", lw=0.8)
        ax.set_xlabel("iteration"); ax.set_ylabel("arena avg reward")
        ax.set_title("Arena: current vs best network")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(pdir, "arena.png"), dpi=120)
        plt.close(fig)


def plot_benchmark(session_dir: str) -> None:
    """Benchmark reward / win-rate curves (``plots.jl:114-162``)."""
    bdir = os.path.join(session_dir, "benchmarks")
    if not os.path.isdir(bdir) or not os.listdir(bdir):
        return
    pdir = os.path.join(session_dir, "plots")
    os.makedirs(pdir, exist_ok=True)
    entries = []
    for fn in sorted(os.listdir(bdir),
                     key=lambda s: int(s.split("_")[1].split(".")[0])):
        with open(os.path.join(bdir, fn)) as f:
            entries.append(json.load(f))
    if not entries:
        return
    legends = [e["legend"] for e in entries[0]["evaluations"]]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for li, legend in enumerate(legends):
        xs, avg, win = [], [], []
        for e in entries:
            if li >= len(e["evaluations"]):
                continue
            ev = e["evaluations"][li]
            xs.append(e["iteration"])
            avg.append(ev["avgr"])
            rewards = ev["rewards"]
            win.append(100.0 * sum(r > 0 for r in rewards)
                       / max(len(rewards), 1))
        axes[0].plot(xs, avg, marker="o", ms=3, label=legend)
        axes[1].plot(xs, win, marker="o", ms=3, label=legend)
    axes[0].set_ylabel("average reward")
    axes[1].set_ylabel("% games won")
    axes[1].set_ylim(-2, 102)
    for a in axes:
        a.set_xlabel("iteration"); a.grid(alpha=0.3); a.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(pdir, "benchmark.png"), dpi=120)
    plt.close(fig)
