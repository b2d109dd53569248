"""Device mesh + sharding layer: multi-chip self-play and learning.

This replaces the reference's distributed layer wholesale: where AlphaZero.jl
ships closures to worker processes over TCP (``Distributed.@spawnat``,
``/root/reference/src/simulations.jl:252-290``) and has no learner data
parallelism at all (``src/params.jl:96,241`` — a single ``use_gpu`` flag),
the TPU design is single-program SPMD over a ``jax.sharding.Mesh``:

* mesh axes ``(data, model)`` — self-play lanes, replay samples and learner
  minibatches are sharded over ``data``; ``model`` is reserved for tensor
  parallelism of large networks (kept size 1 for the reference-scale nets,
  but all annotations thread through it so scaling up is a mesh reshape).
* network parameters are replicated over ``data`` (sharded over ``model``
  when used); gradient reduction is an XLA ``psum`` inserted by GSPMD.
* the self-play -> learner handoff is an in-program resharding (ICI
  collective), not host serialization.

Host orchestration stays single-controller here; under multi-host
``jax.distributed.initialize`` the same program runs SPMD on every host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import arena as arenamod
from .. import config as cfgmod
from .. import memory as memmod
from .. import selfplay as spmod
from ..envs.core import Game
from ..learning import _batch_from
from ..models.interface import NetState, Network, NetworkSpec
from ..ops import losses as L


def make_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model == 0, (n, model)
    arr = np.asarray(devs[:n]).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_lanes(mesh: Mesh, tree):
    """Constrain lane-major arrays (leading dim = lanes) onto the data axis."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        tree)


def data_size(mesh: Optional[Mesh]) -> int:
    """Size of the ``data`` axis (1 when no mesh is in use)."""
    return 1 if mesh is None else mesh.shape["data"]


def shard_axis(mesh: Optional[Mesh], tree, axis: int):
    """Constrain pytree leaves onto the ``data`` axis along ``axis``.

    A leaf whose ``axis`` dimension is not divisible by the data-axis size
    (or too small to shard) is left replicated — partial annotation is always
    sound under GSPMD, it just forgoes the partitioning for that leaf.
    No-op when ``mesh is None`` so callers can thread an optional mesh
    through unconditionally.
    """
    if mesh is None:
        return tree
    n = mesh.shape["data"]

    def one(x):
        if x.ndim <= axis or x.shape[axis] % n != 0 or x.shape[axis] == 0:
            return x
        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(one, tree)


def put_replicated(mesh: Optional[Mesh], tree):
    """Commit a pytree to the mesh, fully replicated (no-op without a mesh)."""
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))


def to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-process sharded) array to host memory.

    Under a multi-controller runtime a ``data``-sharded array spans devices
    of other processes; gather it (a collective — every process must call
    this) before converting.  Single-process / fully-addressable arrays
    convert directly."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_shards[0].data)
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def put_params_model_sharded(mesh: Mesh, net):
    """Tensor-parallel parameter placement: shard every kernel's OUTPUT-
    channel dimension (the last axis of conv/dense kernels) over the
    ``model`` mesh axis; biases/scales shard on their only axis; leaves
    that do not divide evenly stay replicated.

    With parameters committed this way, GSPMD propagates the channel
    sharding through the forward/backward pass (activations become
    channel-sharded between layers and XLA inserts the all-reduces where
    layers contract over channels) — no model code changes.  The
    reference-scale nets (1.6M params) never need this; it exists so the
    same framework scales to networks that do not fit one chip.
    """
    n = mesh.shape["model"]

    def one(x):
        if x.ndim >= 1 and x.shape[-1] % n == 0 and x.shape[-1] >= n > 1:
            spec = [None] * (x.ndim - 1) + ["model"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(one, net)


def put_data_sharded(mesh: Optional[Mesh], tree, axis: int = 0):
    """Commit a pytree to the mesh, sharded along ``axis`` over ``data``
    (leaves that cannot shard evenly are replicated)."""
    if mesh is None:
        return tree
    n = mesh.shape["data"]

    def one(x):
        if x.ndim <= axis or x.shape[axis] % n != 0:
            return jax.device_put(x, replicated(mesh))
        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(one, tree)


@functools.lru_cache(maxsize=16)
def sharded_train_iteration(game: Game, netspec: NetworkSpec,
                            sp_mcts: cfgmod.MctsParams,
                            lp: cfgmod.LearningParams,
                            num_lanes: int, num_sgd_steps: int,
                            mesh: Mesh):
    """One fused train iteration, SPMD over the mesh.

    self-play (lanes on ``data``) -> in-program replay build -> position
    averaging -> ``num_sgd_steps`` data-parallel SGD steps.  This is both the
    production multi-chip path and the driver's multi-chip dry-run target.
    """
    network = Network(game, netspec)
    cfg = arenamod.mcts_config(sp_mcts)
    opt = lp.optimiser.make(num_sgd_steps)
    hp = L.LossHP(
        l2_regularization=lp.l2_regularization,
        nonvalidity_penalty=lp.nonvalidity_penalty,
        rewards_renormalization=lp.rewards_renormalization,
    )

    def loss_fn(params, batch_stats, batch, Wmean, Hp):
        net = NetState(params, batch_stats)
        phat, pinv, vhat, new_stats = network.forward_normalized(
            net, batch["X"], batch["A"], train=True)
        parts = L.losses(phat, pinv, vhat, params, hp, Wmean, Hp,
                         batch["W"], batch["P"], batch["V"])
        return parts.L, (parts, new_stats)

    @functools.partial(
        jax.jit,
        in_shardings=(replicated(mesh), replicated(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def run(net: NetState, rng):
        k_sp, k_ds, k_tr = jax.random.split(rng, 3)

        def oracle(states, obs, mask):
            obs = jax.lax.with_sharding_constraint(
                obs, NamedSharding(mesh, P("data", *[None] * (obs.ndim - 1))))
            pol, _, v, _ = network.forward_normalized(net, obs, mask)
            return pol, v

        tb = spmod.self_play_batch(
            game, oracle, cfg, sp_mcts.temperature, num_lanes, k_sp)
        # replay build: samples sharded over data
        samples = shard_lanes(mesh, dict(
            pi=tb.pi, z=tb.z, t=tb.t, key=tb.key, valid=tb.valid))
        states = shard_lanes(mesh, tb.states)
        replay = memmod.init_replay(game, tb.z.shape[0])
        replay = memmod.push(replay, states, samples["pi"], samples["z"],
                             samples["t"], samples["key"], samples["valid"])
        ds = memmod.make_dataset(game, replay, use_symmetries=False,
                                 use_position_averaging=lp.use_position_averaging)
        w = memmod.sample_weights(ds, lp.samples_weighing_policy)
        Wmean = jnp.sum(w) / jnp.maximum(ds.count, 1)
        # dataset policy entropy, so reported Lp/L match the single-chip
        # Trainer's KL convention (learning.jl:63)
        ent = -jnp.sum(ds.pi * jnp.log(ds.pi + L.EPS), axis=-1)
        Hp = jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1e-12)
        opt_state = opt.init(net.params)

        def step(carry, key):
            params, stats, opt_state = carry
            idx = jax.random.randint(key, (lp.batch_size,), 0,
                                     jnp.maximum(ds.count, 1))
            batch = _batch_from(game, ds, w, idx)
            batch = shard_lanes(mesh, batch)
            (lval, (_, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, batch, Wmean, Hp)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), lval

        (params, stats, _), lvals = jax.lax.scan(
            step, (net.params, net.batch_stats, opt_state),
            jax.random.split(k_tr, num_sgd_steps))
        return NetState(params, stats), lvals

    return run
