"""The learning phase: dataset statistics, gradient updates, status reports.

Re-design of ``/root/reference/src/learning.jl``.  The ``Trainer`` here owns a
jit-compiled update program: one ``lax.scan`` over ``n`` minibatch SGD steps,
each sampling a batch from the merged device-resident dataset, instead of a
host-side ``Flux.DataLoader`` stream.  Compiled programs are cached per
(game, network spec, learning params, dataset shape, num-steps) so repeated
iterations reuse them.

Faithful semantics:

* Position averaging + sample weighting happen at trainer construction
  (``learning.jl:104-108``), via ``memory.make_dataset``.
* ``Wmean`` and the dataset policy entropy ``Hp`` are dataset-level constants
  entering the loss (``learning.jl:110-112``).
* The optimiser state is *re-initialized at every ``batch_updates`` call*,
  as the reference's ``Flux.setup`` per ``train!`` does (``flux.jl:68-95``),
  and cyclic schedules are a function of the step index within the call.
* ``learning_status`` evaluates the loss over the full dataset with the
  network in train mode — deliberately imprinting batch-norm statistics from
  big batches, the reference's high-momentum BN trick (``resnet.jl:19-24``,
  ``learning.jl:159-180``).

Divergence (documented): minibatches are drawn uniformly with replacement
rather than by reshuffled epochs; indistinguishable statistically at these
buffer sizes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import config as cfgmod
from . import memory as memmod
from . import report as R
from .envs.core import Game
from .models.interface import NetState, Network, NetworkSpec, normalize_p
from .ops import losses as L


class TrainerState(NamedTuple):
    net: NetState
    rng: jax.Array


@functools.lru_cache(maxsize=32)
def _dataset_builder(game: Game, use_symmetries: bool,
                     use_position_averaging: bool):
    return jax.jit(functools.partial(
        memmod.make_dataset, game, use_symmetries=use_symmetries,
        use_position_averaging=use_position_averaging))


def _batch_from(game: Game, ds: memmod.Dataset, w, idx):
    """Gather a (W, X, A, P, V) minibatch (``learning.jl:5-51``) by index."""
    states = jax.tree.map(lambda x: x[idx], ds.states)
    obs = jax.vmap(game.observe)(states)
    mask = jax.vmap(game.legal_mask)(states)
    return dict(W=w[idx], X=obs, A=mask, P=ds.pi[idx], V=ds.z[idx])


@functools.lru_cache(maxsize=128)
def _programs(game: Game, spec: NetworkSpec, lp: cfgmod.LearningParams,
              nsteps: int, mesh=None):
    """Build & cache the jitted update / status programs.

    With ``mesh``, every minibatch forward/backward is data-parallel over
    the mesh's ``data`` axis (params replicated, batch sharded, gradient
    reduction an XLA ``psum`` inserted by GSPMD) — the learner data
    parallelism the reference lacks outright (``src/params.jl:96,241``:
    a single ``use_gpu`` flag).
    """
    if mesh is not None:
        from .parallel import shard_axis
        constrain_batch = lambda b: shard_axis(mesh, b, 0)
    else:
        constrain_batch = lambda b: b
    network = Network(game, spec)
    hp = L.LossHP(
        l2_regularization=lp.l2_regularization,
        nonvalidity_penalty=lp.nonvalidity_penalty,
        rewards_renormalization=lp.rewards_renormalization,
    )
    opt = lp.optimiser.make(nsteps)

    def loss_fn(params, batch_stats, batch, Wmean, Hp):
        net = NetState(params, batch_stats)
        phat, pinv, vhat, new_stats = network.forward_normalized(
            net, batch["X"], batch["A"], train=True)
        parts = L.losses(phat, pinv, vhat, params, hp, Wmean, Hp,
                         batch["W"], batch["P"], batch["V"])
        return parts.L, (parts, new_stats)

    @jax.jit
    def batch_updates(ts: TrainerState, ds: memmod.Dataset, w, Wmean, Hp):
        """``nsteps`` SGD steps (``learning.jl:133-142``).  Returns the new
        trainer state and the per-step losses."""
        opt_state = opt.init(ts.net.params)

        def step(carry, key):
            params, stats, opt_state = carry
            idx = jax.random.randint(key, (lp.batch_size,), 0,
                                     jnp.maximum(ds.count, 1))
            batch = constrain_batch(_batch_from(game, ds, w, idx))
            (lval, (_, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, batch, Wmean, Hp)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), lval

        rng, sub = jax.random.split(ts.rng)
        (params, stats, _), lvals = jax.lax.scan(
            step, (ts.net.params, ts.net.batch_stats, opt_state),
            jax.random.split(sub, nsteps))
        return TrainerState(NetState(params, stats), rng), lvals

    @jax.jit
    def learning_status(net: NetState, ds: memmod.Dataset, w, Wmean, Hp,
                        rng):
        """Weighted loss decomposition + entropies over the full dataset
        (``learning.jl:159-180``), scanned in chunks; train-mode BN with
        running-stat updates carried through (the reference's high-momentum
        imprinting trick, ``resnet.jl:19-24``).

        The chunks draw from a *shuffled* order of the valid samples, with
        padding positions wrapped back onto valid rows and stat updates
        frozen on pure-padding chunks.  Both matter: the merged dataset is
        sorted by state key and padded to capacity, so a sequential scan
        would imprint the BN running averages with the statistics of a
        correlated tail — or, past ``count``, of all-zero boards — leaving
        eval-mode inference (arena, benchmarks) with garbage normalization
        (measured: value-head corr 0.29 -> 0.05 and a +0.65 output bias on
        the flagship run; regression test: tests/test_training.py::
        test_bn_imprinting_survives_sorted_padded_dataset).  The W-weighted
        loss sums are permutation-invariant; the reported numbers still
        carry the (small) train-mode BN dependence on how the chunks are
        composed, which now varies with ``rng``."""
        bs = lp.loss_computation_batch_size
        L_pad = ds.z.shape[0]
        nchunks = (L_pad + bs - 1) // bs
        count = jnp.maximum(ds.count, 1)
        # valid-first shuffled ordering: perm[:count] is a random
        # permutation of the valid sample indices
        r = jax.random.uniform(rng, (L_pad,)) + (
            jnp.arange(L_pad) >= count) * 2.0
        perm = jnp.argsort(r)

        def real_chunk(stats, base):
            offs = base + jnp.arange(bs)
            idx = perm[offs % count]
            in_range = offs < count
            batch = constrain_batch(_batch_from(game, ds, w, idx))
            batch["W"] = jnp.where(in_range, batch["W"], 0.0)
            net = NetState(ts_params, stats)
            phat, pinv, vhat, new_stats = network.forward_normalized(
                net, batch["X"], batch["A"], train=True)
            # never imprint stats from an empty dataset (count clamped)
            new_stats = jax.tree.map(
                lambda a, b: jnp.where(ds.count > 0, a, b), new_stats, stats)
            wsum = jnp.sum(batch["W"])
            v = batch["V"] / lp.rewards_renormalization
            vh = vhat / lp.rewards_renormalization
            ce = -jnp.sum(batch["P"] * jnp.log(phat + L.EPS), axis=-1)
            hnet = -jnp.sum(phat * jnp.log(phat + L.EPS), axis=-1)
            hp_ = -jnp.sum(batch["P"] * jnp.log(batch["P"] + L.EPS), axis=-1)
            add = jnp.stack([
                wsum,
                jnp.sum(ce * batch["W"]),
                jnp.sum(jnp.square(vh - v) * batch["W"]),
                jnp.sum(pinv * batch["W"]),
                jnp.sum(hnet * batch["W"]),
                jnp.sum(hp_ * batch["W"]),
            ])
            return new_stats, add

        def chunk(carry, i):
            stats, sums = carry
            base = i * bs
            # skip the network forward entirely on pure-padding chunks
            # (up to half the scan when the buffer is far from full)
            stats, add = jax.lax.cond(
                base < count, real_chunk,
                lambda s, b: (s, jnp.zeros((6,))), stats, base)
            return (stats, sums + add), None

        ts_params = net.params
        (stats, sums), _ = jax.lax.scan(
            chunk, (net.batch_stats, jnp.zeros((6,))), jnp.arange(nchunks))
        wtot = jnp.maximum(sums[0], 1e-12)
        Lp = sums[1] / wtot - Hp
        Lv = sums[2] / wtot
        Lreg = lp.l2_regularization * L.l2_penalty(net.params)
        Linv = lp.nonvalidity_penalty * sums[3] / wtot
        Ltot = Lp + Lv + Lreg + Linv  # full dataset: mean(W) == Wmean
        Hpnet = sums[4] / wtot
        Hp_data = sums[5] / wtot
        return (jnp.stack([Ltot, Lp, Lv, Lreg, Linv, Hp_data, Hpnet]),
                NetState(net.params, stats))

    @jax.jit
    def dataset_stats(ds: memmod.Dataset, w):
        Wmean = jnp.sum(w) / jnp.maximum(ds.count, 1)
        valid = (jnp.arange(ds.z.shape[0]) < ds.count).astype(jnp.float32)
        went = w * valid
        ent = -jnp.sum(ds.pi * jnp.log(ds.pi + L.EPS), axis=-1)
        Hp = jnp.sum(ent * went) / jnp.maximum(jnp.sum(went), 1e-12)
        return Wmean, Hp

    return dict(batch_updates=batch_updates, learning_status=learning_status,
                dataset_stats=dataset_stats, network=network)


class Trainer:
    """Owns the merged dataset and the compiled update programs
    (``learning.jl:96-121``)."""

    def __init__(self, game: Game, spec: NetworkSpec, net: NetState,
                 replay: memmod.Replay, lp: cfgmod.LearningParams,
                 use_symmetries: bool, rng, mesh=None):
        self.game, self.spec, self.lp = game, spec, lp
        self.mesh = mesh
        self.dataset = _dataset_builder(
            game, use_symmetries, lp.use_position_averaging)(replay)
        self.weights = memmod.sample_weights(
            self.dataset, lp.samples_weighing_policy)
        if mesh is not None:
            from .parallel import put_data_sharded, put_replicated
            self.dataset = put_data_sharded(mesh, self.dataset, 0)
            self.weights = put_data_sharded(mesh, self.weights, 0)
            net = put_replicated(mesh, net)
        progs = _programs(game, spec, lp, 1, mesh)
        self.Wmean, self.Hp = progs["dataset_stats"](
            self.dataset, self.weights)
        self.state = TrainerState(net=net, rng=rng)

    @property
    def num_samples(self) -> int:
        return int(self.dataset.count)

    def num_batches_total(self) -> int:
        return self.num_samples // self.lp.batch_size

    def batches_per_checkpoint(self) -> int:
        """``learning.jl:211-216``, quantized to multiples of 128 above 128
        so the ``nsteps``-long jitted update scan caches across iterations
        (the raw count tracks the growing dataset and would force a fresh
        multi-minute XLA compile every iteration)."""
        n = self.lp.max_batches_per_checkpoint
        if self.lp.min_checkpoints_per_epoch:
            n = min(n, self.num_batches_total()
                    // self.lp.min_checkpoints_per_epoch)
        if n > 128:
            n = n // 128 * 128
        return max(n, 1)

    def batch_updates(self, nsteps: int) -> np.ndarray:
        progs = _programs(self.game, self.spec, self.lp, nsteps, self.mesh)
        self.state, lvals = progs["batch_updates"](
            self.state, self.dataset, self.weights, self.Wmean, self.Hp)
        return np.asarray(lvals)

    def learning_status(self) -> R.LearningStatus:
        progs = _programs(self.game, self.spec, self.lp, 1, self.mesh)
        rng, sub = jax.random.split(self.state.rng)
        vals, net = progs["learning_status"](
            self.state.net, self.dataset, self.weights, self.Wmean, self.Hp,
            sub)
        self.state = self.state._replace(net=net, rng=rng)
        Ltot, Lp, Lv, Lreg, Linv, Hp, Hpnet = map(float, np.asarray(vals))
        return R.LearningStatus(
            loss=R.Loss(L=Ltot, Lp=Lp, Lv=Lv, Lreg=Lreg, Linv=Linv),
            Hp=Hp, Hpnet=Hpnet)

    def samples_report(self) -> R.Samples:
        """``learning.jl:182-189``.  Reductions over the (possibly sharded)
        dataset stay inside jit — eager sums over sharded arrays become
        ad-hoc collectives (NOTES.md) and cannot fetch multi-process."""
        status = self.learning_status()
        num_samples = int(jax.jit(jnp.sum)(self.dataset.n_merged))
        return R.Samples(
            num_samples=num_samples,
            num_boards=self.num_samples,
            Wtot=float(jax.jit(jnp.sum)(self.weights)),
            status=status)
