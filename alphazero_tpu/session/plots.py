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


def _update_threshold(session_dir: str):
    try:
        with open(os.path.join(session_dir, "params.json")) as f:
            return json.load(f)["arena"]["update_threshold"]
    except (OSError, KeyError, TypeError):
        return None


def _momentum_smoothing(xs, alpha=0.1):
    """(``Util.momentum_smoothing``, ``src/util.jl:115-121``)"""
    out, m = [], None
    for x in xs:
        m = x if m is None else alpha * x + (1 - alpha) * m
        out.append(m)
    return out


def plot_iteration(session_dir: str, itc: int) -> None:
    """The reference's per-iteration plot families
    (``plot_iteration``, ``plots.jl:82-108``): checkpoint losses + arena
    scatter (``iter_summary``), phase-time pies (``iter_perfs``), smoothed
    minibatch losses (``iter_loss``) — one PNG per iteration under
    ``plots/<family>/<itc>.png``."""
    path = os.path.join(session_dir, "reports", f"iter_{itc}.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        rep = json.load(f)
    learning = rep.get("learning") or {}
    checkpoints = learning.get("checkpoints") or []
    pdir = os.path.join(session_dir, "plots")

    def save(fig, family):
        d = os.path.join(pdir, family)
        os.makedirs(d, exist_ok=True)
        fig.tight_layout()
        fig.savefig(os.path.join(d, f"{itc}.png"), dpi=120)
        plt.close(fig)

    # --- iter_summary: losses over checkpoints + arena scatter ----------
    if checkpoints:
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 7))
        xs = [0] + [c["batch_id"] for c in checkpoints]
        init = learning.get("initial_status") or {}
        for comp in ["L", "Lp", "Lv", "Lreg", "Linv"]:
            ys = [(init.get("loss") or {}).get(comp)] + [
                ((c.get("status_after_update") or {}).get("loss") or {})
                .get(comp) for c in checkpoints]
            ax1.plot(xs, ys, marker="o", ms=3, label=comp)
        ax1.set_title("Losses"); ax1.legend(fontsize=8); ax1.grid(alpha=0.3)
        cx = [c["batch_id"] for c in checkpoints]
        cy = [(c.get("evaluation") or {}).get("avgr") for c in checkpoints]
        ax2.scatter(cx, cy)
        ax2.set_ylim(-1, 1)
        ax2.axhline(0, color="gray", lw=0.8)
        thr = _update_threshold(session_dir)
        if thr is not None:
            ax2.axhline(thr, color="red", lw=0.8, ls="--")
        ax2.set_title("Checkpoints"); ax2.set_xlabel("batch number")
        ax2.grid(alpha=0.3)
        save(fig, "iter_summary")

    # --- iter_perfs: phase-time pies (``performances_plot``) ------------
    fig, axes = plt.subplots(1, 2, figsize=(10, 4.5))
    glob_labels = ["Self Play", "Memory Analysis", "Learning"]
    glob_vals = [((rep.get("perfs_self_play") or {}).get("time", 0)),
                 ((rep.get("perfs_memory_analysis") or {}).get("time", 0)),
                 ((rep.get("perfs_learning") or {}).get("time", 0))]
    pairs = [(l, v) for l, v in zip(glob_labels, glob_vals) if v and v > 0]
    if pairs:
        axes[0].pie([v for _, v in pairs], labels=[l for l, _ in pairs],
                    autopct="%.0f%%", textprops={"fontsize": 8})
    axes[0].set_title("Global")
    learn_labels = ["Samples conversion", "Loss computation",
                    "Optimization", "Arena (MCTS)"]
    learn_vals = [learning.get("time_convert", 0),
                  learning.get("time_loss", 0),
                  learning.get("time_train", 0),
                  learning.get("time_eval", 0)]
    pairs = [(l, v) for l, v in zip(learn_labels, learn_vals)
             if v and v > 0]
    if pairs:
        axes[1].pie([v for _, v in pairs], labels=[l for l, _ in pairs],
                    autopct="%.0f%%", textprops={"fontsize": 8})
    axes[1].set_title("Learning")
    save(fig, "iter_perfs")

    # --- iter_loss: smoothed minibatch losses ---------------------------
    losses = learning.get("losses") or []
    if losses:
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(_momentum_smoothing(losses, 0.1))
        ax.set_ylim(0, None)
        ax.set_title("Loss on Minibatches"); ax.set_xlabel("batch number")
        ax.grid(alpha=0.3)
        save(fig, "iter_loss")


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

    # arena (gating) results: best checkpoint avgr per iteration, as bars
    # with the 0 and update-threshold lines (``plots.jl:189-200``)
    avgr = []
    for _, r in reports:
        cks = (r.get("learning") or {}).get("checkpoints") or []
        vals = [c["evaluation"]["avgr"] for c in cks if c.get("evaluation")]
        avgr.append(max(vals) if vals else None)
    if any(v is not None for v in avgr):
        fig, ax = plt.subplots(figsize=(7, 4.5))
        xs = [i for i, v in zip(iters, avgr) if v is not None]
        ys = [v for v in avgr if v is not None]
        ax.bar(xs, ys, width=0.7)
        ax.axhline(0, color="gray", lw=0.8)
        thr = _update_threshold(session_dir)
        if thr is not None:
            ax.axhline(thr, color="red", lw=0.8, ls="--",
                       label="update threshold")
            ax.legend(fontsize=8)
        ax.set_ylim(-1, 1)
        ax.set_xlabel("iteration"); ax.set_ylabel("arena avg reward")
        ax.set_title("Arena Results")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(pdir, "arena.png"), dpi=120)
        plt.close(fig)

    # experience buffer size + distinct boards (``plots.jl:179-187``)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(iters, series(["self_play", "memory_size"]),
            marker="o", ms=3, label="number of samples")
    ax.plot(iters, series(["self_play", "memory_num_distinct_boards"]),
            marker="o", ms=3, label="distinct boards")
    ax.set_xlabel("iteration"); ax.set_title("Experience Buffer Size")
    ax.legend(); ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(pdir, "nsamples.png"), dpi=120)
    plt.close(fig)

    # memory-analysis plots (``plots.jl:207-233``), when the reports carry
    # a memory section: loss on the latest self-play batch + per-stage loss
    if all(r.get("memory") for _, r in reports):
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for comp in ["L", "Lp", "Lv", "Lreg", "Linv"]:
            ax.plot(iters, series(["memory", "latest_batch", "status",
                                   "loss", comp]),
                    marker="o", ms=3, label=comp)
        ax.set_xlabel("iteration"); ax.set_title("Loss on Last Batch")
        ax.legend(fontsize=8); ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(pdir, "loss_last_batch.png"), dpi=120)
        plt.close(fig)

        nstages = min(len(r["memory"]["per_game_stage"]) for _, r in reports)
        if nstages > 0:
            cmap = plt.get_cmap("coolwarm")
            fig, ax = plt.subplots(figsize=(7, 4.5))
            for s in range(nstages):
                stages = [r["memory"]["per_game_stage"][s]
                          for _, r in reports]
                tmin = min(st["min_remaining_length"] for st in stages)
                tmax = max(st["max_remaining_length"] for st in stages)
                ax.plot(iters,
                        [st["samples_stats"]["status"]["loss"]["L"]
                         for st in stages],
                        marker="o", ms=3,
                        color=cmap(s / max(nstages - 1, 1)),
                        label=f"{tmin:.0f} to {tmax:.0f} turns left")
            ax.set_ylim(0, None)
            ax.set_xlabel("iteration"); ax.set_title("Loss per Game Stage")
            ax.legend(fontsize=8); ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(os.path.join(pdir, "loss_per_stage.png"), dpi=120)
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
    stale = any(e.get("minmax_baseline_stale") for e in entries)
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
        # vs-MinMax series measured against the round-2 degraded baseline
        # (NOTES.md round 3) render dashed + flagged, not as clean claims
        kw = {}
        if stale and "MinMax" in legend:
            kw = dict(linestyle="--", alpha=0.5)
            legend += " (STALE baseline)"
        axes[0].plot(xs, avg, marker="o", ms=3, label=legend, **kw)
        axes[1].plot(xs, win, marker="o", ms=3, label=legend, **kw)
    axes[0].set_ylabel("average reward")
    axes[1].set_ylabel("% games won")
    axes[1].set_ylim(-2, 102)
    for a in axes:
        a.set_xlabel("iteration"); a.grid(alpha=0.3); a.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(pdir, "benchmark.png"), dpi=120)
    plt.close(fig)
