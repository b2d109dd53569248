"""Session: persistent training UX (checkpointing, logging, benchmarks).

Re-design of ``/root/reference/src/ui/session.jl``: a Session wraps an
``AZEnv`` with a directory, implements the Handlers callbacks to render
console reports, saves everything after *every* iteration
(``save_increment!``, ``session.jl:163-183``), auto-resumes from a valid
directory (``session.jl:273-298``) checking network-spec equality and
warning on changed params, and runs the benchmark suite at iteration 0 and
after each iteration.

On-disk layout (mirroring ``session.jl:68-80``):

    <dir>/params.json          hyperparameters (JSON mirror)
    <dir>/netspec.json         network spec
    <dir>/meta.json            iteration counter, replay capacity, rng state
    <dir>/curnn.npz bestnn.npz network states
    <dir>/mem.npz              replay buffer
    <dir>/reports/iter_N.json  per-iteration report
    <dir>/benchmarks/iter_N.json
    <dir>/log.txt              full log
    <dir>/plots/               training curves
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import jax
import numpy as np

from .. import arena as arenamod
from .. import config as cfgmod
from .. import memory as memmod
from .. import report as R
from .. import training
from ..experiments import Experiment
from ..models.interface import NetState, Network, NetworkSpec
from .log import Logger


def _to_host(x) -> np.ndarray:
    """Fetch an array to host memory (collective under multi-host; see
    ``parallel.to_host``) so every host sees a complete checkpoint."""
    from ..parallel import to_host
    return to_host(x)


def is_main_process() -> bool:
    """True on the (single) process that should write checkpoint files.
    Under a multi-controller runtime every host runs the same Session loop;
    collectives (``_to_host``) must run on every process, file writes on
    exactly one (they share a filesystem in pods and in the local tests)."""
    return jax.process_index() == 0


def save_pytree(path: str, tree) -> None:
    leaves = jax.tree.leaves(tree)
    # the allgather inside _to_host is a collective: every process must
    # execute it even though only process 0 writes
    host = {f"l{i}": _to_host(x) for i, x in enumerate(leaves)}
    if is_main_process():
        np.savez(path, **host)


def load_pytree(path: str, template):
    data = np.load(path)
    leaves = [data[f"l{i}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    assert len(leaves) == len(t_leaves), \
        f"checkpoint structure mismatch at {path}"
    import jax.numpy as jnp
    coerced = [jnp.asarray(l, t.dtype) for l, t in zip(leaves, t_leaves)]
    return jax.tree.unflatten(treedef, coerced)


class Session(training.Handlers):
    """(``session.jl:46-62``)"""

    def __init__(self, experiment: Experiment, dir: Optional[str] = None,
                 autosave: bool = True, save_intermediate: bool = False,
                 seed: int = 0, quiet: bool = False,
                 benchmark_every: int = 1, mesh=None):
        self.experiment = experiment
        self.dir = dir or os.path.join("sessions", experiment.name)
        self.autosave = autosave
        self.quiet = quiet
        self.save_intermediate = save_intermediate
        # optional jax.sharding.Mesh: runs every phase SPMD over its `data`
        # axis (self-play lanes, replay, learner batches, arena lanes); the
        # session logic itself is layout-independent
        self.mesh = mesh
        # run the benchmark suite at iterations 0, k*benchmark_every, and the
        # final iteration (the reference benchmarks every iteration,
        # ``session.jl:529-533``; sparser cadences save evaluation compute)
        self.benchmark_every = max(1, benchmark_every)
        os.makedirs(self.dir, exist_ok=True)
        os.makedirs(os.path.join(self.dir, "reports"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "benchmarks"), exist_ok=True)
        self.logger = Logger(
            logfile=os.path.join(self.dir, "log.txt"),
            console=open(os.devnull, "w") if quiet else None)
        self.benchmark_history: List[dict] = []
        if self._valid_session_dir():
            self._load(seed)
        else:
            self.logger.print(f"Initializing a new AlphaZero environment "
                              f"in {self.dir}")
            self.env = training.AZEnv.create(
                experiment.game, experiment.netspec, experiment.params,
                seed=seed, mesh=mesh)
            self._fresh = True
        self._load_benchmark_history()

    # ---- persistence ----------------------------------------------------

    def _valid_session_dir(self) -> bool:
        need = ["meta.json", "curnn.npz", "bestnn.npz", "mem.npz",
                "netspec.json"]
        return all(os.path.exists(os.path.join(self.dir, f)) for f in need)

    def save(self, dir: Optional[str] = None) -> None:
        """(``session.jl:92-108``)"""
        d = dir or self.dir
        os.makedirs(d, exist_ok=True)
        e, env = self.experiment, self.env
        if is_main_process():
            with open(os.path.join(d, "params.json"), "w") as f:
                f.write(cfgmod.params_to_json(env.params))
            with open(os.path.join(d, "netspec.json"), "w") as f:
                json.dump(e.netspec.to_json(), f, indent=2)
            with open(os.path.join(d, "meta.json"), "w") as f:
                json.dump({
                    "iteration": env.itc,
                    "replay_capacity": env.replay.capacity,
                    "rng": np.asarray(
                        jax.random.key_data(env.rng)).tolist(),
                    "game": e.game.name,
                    "canary": getattr(self, "canary", "not-run"),
                }, f, indent=2)
        save_pytree(os.path.join(d, "curnn.npz"), env.curnn)
        save_pytree(os.path.join(d, "bestnn.npz"), env.bestnn)
        save_pytree(os.path.join(d, "mem.npz"), env.replay)

    def _load(self, seed: int) -> None:
        """(``load_env``, ``session.jl:110-118``; spec checks ``:282-291``)"""
        e = self.experiment
        with open(os.path.join(self.dir, "meta.json")) as f:
            meta = json.load(f)
        with open(os.path.join(self.dir, "netspec.json")) as f:
            saved_spec = json.load(f)
        # normalize through from_json/to_json (tuples become lists; fields
        # added since the save get their defaults) before comparing
        saved_spec = NetworkSpec.from_json(saved_spec).to_json()
        if (json.loads(json.dumps(saved_spec))
                != json.loads(json.dumps(e.netspec.to_json()))):
            raise ValueError(
                "Session directory was created with a different network "
                f"spec: {saved_spec} != {e.netspec.to_json()}")
        with open(os.path.join(self.dir, "params.json")) as f:
            saved_params = f.read()
        if saved_params != cfgmod.params_to_json(e.params):
            self.logger.print(
                "Warning: session parameters differ from the saved ones; "
                "using the new parameters.")
        network = Network(e.game, e.netspec)
        net_t = network.init(jax.random.key(0))
        curnn = load_pytree(os.path.join(self.dir, "curnn.npz"), net_t)
        bestnn = load_pytree(os.path.join(self.dir, "bestnn.npz"), net_t)
        replay_t = memmod.init_replay(e.game, meta["replay_capacity"])
        replay = load_pytree(os.path.join(self.dir, "mem.npz"), replay_t)
        rng = jax.random.wrap_key_data(
            np.asarray(meta["rng"], dtype=np.uint32))
        self.env = training.AZEnv(
            game=e.game, netspec=e.netspec, params=e.params, curnn=curnn,
            bestnn=bestnn, replay=replay, itc=meta["iteration"], rng=rng,
            mesh=self.mesh)
        self.env.commit_to_mesh()
        self._fresh = False
        self.logger.print(
            f"Loaded session from {self.dir} at iteration {meta['iteration']}")

    def _load_benchmark_history(self):
        bdir = os.path.join(self.dir, "benchmarks")
        self.benchmark_history = []
        for fn in sorted(os.listdir(bdir),
                         key=lambda s: int(s.split("_")[1].split(".")[0])):
            with open(os.path.join(bdir, fn)) as f:
                self.benchmark_history.append(json.load(f))

    # ---- benchmark ------------------------------------------------------

    def run_benchmark(self) -> List[R.Evaluation]:
        """(``session.jl:214-221``)"""
        env = self.env
        evals = []
        for item in self.experiment.benchmark:
            ev = arenamod.run_benchmark_item(
                env.game, env.netspec, env.bestnn, item, env.next_key(),
                gamma=env.params.self_play.mcts.gamma, mesh=env.mesh)
            evals.append(ev)
            self._log_evaluation(ev)
        if evals:
            payload = {"iteration": env.itc,
                       "evaluations": [R.to_dict(e) for e in evals]}
            if is_main_process():
                with open(os.path.join(self.dir, "benchmarks",
                                       f"iter_{env.itc}.json"), "w") as f:
                    json.dump(payload, f, indent=2)
            self.benchmark_history = [
                b for b in self.benchmark_history
                if b["iteration"] != env.itc] + [payload]
            self.benchmark_history.sort(key=lambda b: b["iteration"])
        return evals

    def _log_evaluation(self, ev: R.Evaluation):
        log = self.logger
        with log.section(f"Benchmark: {ev.legend}"):
            rows = [["avg reward", f"{ev.avgr:+.3f}"],
                    ["redundancy", f"{ev.redundancy:.1%}"],
                    ["duration", f"{ev.time:.1f}s"]]
            if self.env.params.ternary_outcome:
                won, draw, lost = arenamod.ternary_stats(ev.rewards)
                n = max(len(ev.rewards), 1)
                rows.insert(1, ["won/draw/lost",
                                f"{won/n:.0%} / {draw/n:.0%} / {lost/n:.0%}"])
            log.table(["metric", "value"], rows)

    # ---- main entry points ----------------------------------------------

    def resume(self) -> None:
        """Start or resume training (``resume!``, ``session.jl:310-321``)."""
        # chip-integrity canary before any number is produced (NOTES.md
        # round-3 fault history; no-op on CPU runtimes)
        from ..utils import canary as canarymod
        self.canary = canarymod.summary(canarymod.validate_chip())
        if self.canary != "skipped":
            self.logger.print(f"Chip canary: {self.canary}")
        if self._fresh:
            with self.logger.section("Initial report"):
                init = training.initial_report(self.env)
                self.logger.table(["item", "value"], [
                    ["network parameters", init.num_network_parameters],
                    ["mcts footprint/node (bytes)",
                     init.mcts_footprint_per_node]])
                for e in init.errors:
                    self.logger.print(f"ERROR: {e}")
                for w in init.warnings:
                    self.logger.print(f"warning: {w}")
                if init.errors:
                    raise ValueError("invalid parameters: " +
                                     "; ".join(init.errors))
            if self.benchmark_every <= self.env.params.num_iters:
                # (a cadence beyond num_iters means "final only": skip the
                # iteration-0 anchor too — post-hoc sweeps over saved
                # iterations can recover the full curve)
                with self.logger.section("Iteration 0 benchmark"):
                    self.run_benchmark()
            if self.autosave:
                self.save()
            self._fresh = False
        try:
            training.train(self.env, self)
        except KeyboardInterrupt:
            # exit cleanly with the last iteration saved (session.jl:317-320)
            self.logger.print("Interrupted: last completed iteration saved.")

    def run_new_benchmark(self, benchmark, out_name: str = "new_benchmark"):
        """Re-run a (possibly new) benchmark suite over saved per-iteration
        environments (``session.jl:549-570``; requires sessions trained with
        ``save_intermediate=True``)."""
        results = []
        iters = sorted(
            int(d.split("_")[1]) for d in os.listdir(self.dir)
            if d.startswith("iter_") and
            os.path.isdir(os.path.join(self.dir, d)))
        for itc in iters:
            sub = Session(self.experiment,
                          dir=os.path.join(self.dir, f"iter_{itc}"),
                          autosave=False, quiet=True)
            evals = []
            for item in benchmark:
                ev = arenamod.run_benchmark_item(
                    sub.env.game, sub.env.netspec, sub.env.bestnn, item,
                    sub.env.next_key(),
                    gamma=sub.env.params.self_play.mcts.gamma)
                evals.append(R.to_dict(ev))
            results.append({"iteration": itc, "evaluations": evals})
        out = os.path.join(self.dir, f"{out_name}.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        self.logger.print(f"re-ran benchmark over {len(iters)} saved "
                          f"iterations -> {out}")
        return results

    # ---- Handlers implementation (``session.jl:468-538``) ---------------

    def iteration_started(self, env):
        self.logger.print("")
        self.logger.print(f"=== Starting iteration {env.itc + 1} "
                          f"/ {env.params.num_iters} ===")

    def self_play_started(self, env):
        self.logger.print("Self-play in progress...")
        self._sp_done = 0
        self._sp_bar_done = False
        self._sp_rewards: List[float] = []
        self._sp_total = env.params.self_play.sim.num_games

    def game_played(self, env, reward=None):
        if reward is not None:
            self._sp_rewards.append(reward)
        # in-place progress line (per completed game, like the reference's
        # ProgressMeter relay, ``session.jl:476``); stderr only so log
        # files stay clean.  Emitted only by the main process and only when
        # the session isn't quiet — under the multi-controller runtime every
        # process runs the handlers, and an interleaved bar per process is
        # garbage (ADVICE r3).  Counts are clamped to num_games: lanes are
        # counted per dispatch round, so the raw counter can overshoot.
        self._sp_done += 1
        if self.quiet or not is_main_process():
            return
        tot = max(self._sp_total, 1)
        n = min(self._sp_done, tot)
        done = n == tot and not getattr(self, "_sp_bar_done", False)
        if (n % 64 == 0 and self._sp_done <= tot) or done:
            import sys
            self._sp_bar_done = n == tot
            bar = "#" * int(30 * n / tot)
            print(f"\r  self-play [{bar:<30}] {n}/{tot}",
                  end="\n" if n == tot else "", file=sys.stderr, flush=True)

    def self_play_finished(self, env, rep: R.SelfPlay):
        rews = getattr(self, "_sp_rewards", [])
        extra = []
        if rews:  # per-game measurement relay (``simulations.jl:258-266``)
            n = len(rews)
            extra = [["white w/d/l %",
                      f"{100*sum(r > 0 for r in rews)/n:.0f}"
                      f" / {100*sum(r == 0 for r in rews)/n:.0f}"
                      f" / {100*sum(r < 0 for r in rews)/n:.0f}"]]
        with self.logger.section("Self-play finished"):
            self.logger.table(["metric", "value"], extra + [
                ["samples/second", f"{rep.samples_gen_speed:.1f}"],
                ["avg exploration depth",
                 f"{rep.average_exploration_depth:.2f}"],
                ["MCTS tree footprint",
                 f"{rep.mcts_memory_footprint / 1e6:.1f} MB"],
                ["memory size", rep.memory_size],
                ["distinct boards", rep.memory_num_distinct_boards]])

    def updates_finished(self, env, st: R.LearningStatus):
        with self.logger.section("Learning status"):
            l = st.loss
            self.logger.table(
                ["L", "Lp", "Lv", "Lreg", "Linv", "Hp", "Hpnet"],
                [[l.L, l.Lp, l.Lv, l.Lreg, l.Linv, st.Hp, st.Hpnet]])

    def checkpoint_finished(self, env, ckpt: R.Checkpoint):
        ev = ckpt.evaluation
        if ev is not None:
            mark = "REPLACED" if ckpt.nn_replaced else "kept"
            self.logger.print(
                f"Checkpoint: arena avg reward {ev.avgr:+.3f} "
                f"(redundancy {ev.redundancy:.0%}) -> best network {mark}")

    def memory_analyzed(self, env, rep: R.Memory):
        with self.logger.section("Memory analysis"):
            rows = []
            for st in rep.per_game_stage:
                rows.append([f"{st.min_remaining_length:.0f}-"
                             f"{st.max_remaining_length:.0f}",
                             st.samples_stats.num_samples,
                             st.samples_stats.status.loss.Lv,
                             st.samples_stats.status.loss.Lp])
            self.logger.table(
                ["remaining moves", "samples", "Lv", "Lp"], rows)

    def iteration_finished(self, env, rep: R.Iteration):
        if is_main_process():
            with open(os.path.join(self.dir, "reports",
                                   f"iter_{env.itc}.json"), "w") as f:
                json.dump(R.to_dict(rep), f, indent=2)
        with self.logger.section(f"Iteration {env.itc} finished"):
            self.logger.table(["phase", "seconds"], [
                ["self play", f"{rep.perfs_self_play.time:.1f}"],
                ["memory analysis", f"{rep.perfs_memory_analysis.time:.1f}"],
                ["learning", f"{rep.perfs_learning.time:.1f}"]])
        if (env.itc % self.benchmark_every == 0
                or env.itc >= env.params.num_iters):
            self.run_benchmark()
        if self.autosave:
            self.save()
            if self.save_intermediate:
                self.save(os.path.join(self.dir, f"iter_{env.itc}"))
            self.logger.print(f"Session saved to {self.dir}")
        if not is_main_process():
            return
        try:
            from .plots import plot_benchmark, plot_iteration, plot_training
            plot_iteration(self.dir, env.itc)
            plot_training(self.dir)
            plot_benchmark(self.dir)
        except Exception as exc:  # plots must never kill training
            self.logger.print(f"(plotting failed: {exc})")

    def training_finished(self, env):
        self.logger.print("")
        self.logger.print("Training finished.")


class EvalSnapshot:
    """A loaded network snapshot for evaluation-only tooling."""

    def __init__(self, experiment: Experiment, dir: str):
        self.experiment = experiment
        self.dir = dir
        self.game = experiment.game
        self.netspec = experiment.netspec


def load_eval_net(experiment: Experiment, dir: str) -> "EvalSnapshot":
    """Load just the promoted network of a saved session/snapshot dir.

    Evaluation tools (benchmark_sweep, pons_benchmark) must NOT go through
    ``Session(...)``: its resume check requires ``mem.npz``, which
    ``.gitignore`` excludes for ``sessions/*/iter_*`` snapshots, and an
    incomplete dir silently falls back to a FRESH random-weight env — a
    sweep would then benchmark random networks and write plausible-looking
    results (ADVICE r3, medium).  This path needs only ``bestnn.npz`` +
    ``netspec.json`` (+ ``meta.json`` for the iteration number) and fails
    loudly when they are absent or mismatched.
    """
    for need in ("netspec.json", "bestnn.npz", "meta.json"):
        path = os.path.join(dir, need)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"not a loadable snapshot: {path} is missing (train with "
                "--save-intermediate to create per-iteration snapshots)")
    with open(os.path.join(dir, "netspec.json")) as f:
        saved_spec = NetworkSpec.from_json(json.load(f)).to_json()

    def arch_only(spec_json):
        # init_* fields parameterize INITIALIZATION only — a loaded
        # checkpoint's weights and forward pass are unaffected, and
        # pre-round-4 snapshots predate the fields entirely, so eval
        # loading compares architecture modulo them
        d = json.loads(json.dumps(spec_json))
        for k in ("init_scheme", "policy_init_gain", "value_init_gain"):
            d.pop(k, None)
        return d

    if arch_only(saved_spec) != arch_only(experiment.netspec.to_json()):
        raise ValueError(
            f"snapshot {dir} was created with a different network spec: "
            f"{saved_spec} != {experiment.netspec.to_json()}")
    snap = EvalSnapshot(experiment, dir)
    with open(os.path.join(dir, "meta.json")) as f:
        snap.iteration = json.load(f)["iteration"]
    network = Network(experiment.game, experiment.netspec)
    net_t = network.init(jax.random.key(0))
    snap.bestnn = load_pytree(os.path.join(dir, "bestnn.npz"), net_t)
    return snap
