"""Framework-agnostic network contract, TPU edition.

Re-design of the reference Network interface
(``/root/reference/src/networks/network.jl``).  A network is a flax module
built from a :class:`NetworkSpec`; its state is an explicit pytree
(:class:`NetState`: params + batch-norm statistics), so "copying the best
network" (``network.jl:323-328``) is just carrying a pytree, and device
placement is handled by jit/shardings rather than a ``use_gpu`` flag.

Semantics preserved from the reference:

* ``forward`` returns *probabilities* (softmax inside the net) and a value in
  [-1, 1], batch-first here (the reference is batch-last, ``network.jl:120-132``).
* ``forward_normalized`` masks invalid actions, renormalizes, and returns the
  probability mass put on invalid actions (``network.jl:242-271``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..envs.core import Game


class NetState(NamedTuple):
    """Trainable network state: parameters + batch-norm running stats."""

    params: Any
    batch_stats: Any


def kernel_initializer(scheme: str, gain: float = 1.0):
    """Kernel initializer for conv/dense layers.

    ``"flux"`` is glorot_uniform — the reference's FluxLib default for every
    Dense/Conv kernel (``Flux.glorot_uniform``); ``"lecun"`` is flax's
    lecun_normal default (this repo's rounds 1-3 behavior).  The distinction
    is load-bearing, not cosmetic: the untrained reference net measurably
    emits value outputs of RMS ~0.4-0.5 and puts 14% of policy mass on
    invalid actions at iteration 1 (``docs/src/assets/img/ui-first-iter.png``:
    learning-start Lv=1.024 > E[z^2], Linv=0.145), and those decisive random
    (but per-state-consistent, hence *learnable*) outputs make its
    iteration-1 search concentrated (stored-pi entropy 1.02, exploration
    depth 5.3) where a near-silent init (flax lecun value RMS ~0.09) leaves
    the search prior-uniform (our measured iteration-1 entropy 1.78, depth
    4.1) and the resulting targets noise-dominated and unfittable
    (round-4 probes: probe_overtrain.py, probe_ref_entropy.py).  ``gain``
    scales a head's final kernels to match the reference's measured init
    output statistics where framework init conventions still differ.
    """
    if scheme == "lecun":
        init = jax.nn.initializers.lecun_normal()
    elif scheme == "flux":
        init = jax.nn.initializers.glorot_uniform()
    else:
        raise ValueError(f"unknown init scheme: {scheme}")
    if gain == 1.0:
        return init
    def scaled(key, shape, dtype=jnp.float32):
        return gain * init(key, shape, dtype)
    return scaled


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    """Abstract network spec; subclasses define ``build(game) -> nn.Module``."""

    def build(self, game: Game):
        raise NotImplementedError

    def inference_spec(self) -> "NetworkSpec":
        """The spec used by inference-only programs (self-play oracles,
        arena/benchmark players).  Parameters and BN statistics stay f32
        and are shared with the training spec; subclasses may lower the
        *compute* dtype (bf16 rides the MXU at twice the f32 rate).  The
        reference's analogue is the ``test_mode`` network copy
        (``network.jl:323-328``)."""
        return self

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["type"] = type(self).__name__
        return d

    @staticmethod
    def from_json(d: dict) -> "NetworkSpec":
        from .simplenet import SimpleNetSpec
        from .resnet import ResNetSpec
        d = dict(d)
        kind = d.pop("type")
        cls = {c.__name__: c for c in (SimpleNetSpec, ResNetSpec)}[kind]
        if "conv_kernel_size" in d and d["conv_kernel_size"] is not None:
            d["conv_kernel_size"] = tuple(d["conv_kernel_size"])
        return cls(**d)


class Network:
    """A built network: module + pure apply functions over ``NetState``."""

    def __init__(self, game: Game, spec: NetworkSpec):
        self.game = game
        self.spec = spec
        self.module = spec.build(game)

    def init(self, rng) -> NetState:
        dummy = jnp.zeros((1,) + self.game.obs_shape, jnp.float32)
        variables = self.module.init(rng, dummy, train=False)
        return NetState(params=variables["params"],
                        batch_stats=variables.get("batch_stats", {}))

    def forward(self, state: NetState, obs, *, train: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
        """Batched forward pass: ``obs [B, ...] -> (P [B,A], V [B], stats)``.

        When ``train`` is true, batch-norm uses minibatch statistics and the
        updated running stats are returned (else the input stats pass through).
        """
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if train:
            (p, v), mut = self.module.apply(
                variables, obs, train=True, mutable=["batch_stats"])
            return p, v, mut["batch_stats"]
        p, v = self.module.apply(variables, obs, train=False)
        return p, v, state.batch_stats

    def forward_normalized(self, state: NetState, obs, mask, *,
                           train: bool = False):
        """Masked & renormalized policy (``network.jl:242-271``).

        Returns ``(P, V, p_invalid, batch_stats)`` where ``p_invalid`` [B] is
        the raw probability mass on invalid actions.
        """
        p, v, stats = self.forward(state, obs, train=train)
        return (*normalize_p(p, mask), v, stats)

    def oracle(self, state: NetState):
        """An MCTS oracle ``(obs, mask) -> (P, V)`` in eval mode
        (= ``Network.evaluate_batch``, ``network.jl:308-315``)."""
        def fn(obs, mask):
            pnorm, _, v, _ = self.forward_normalized(state, obs, mask)
            return pnorm, v
        return fn

    def num_parameters(self, state: NetState) -> int:
        """(``network.jl:217-222``)"""
        return sum(x.size for x in jax.tree.leaves(state.params))

    def mean_weight(self, state: NetState) -> float:
        leaves = jax.tree.leaves(state.params)
        total = sum(jnp.sum(jnp.abs(x)) for x in leaves)
        return float(total / self.num_parameters(state))


def normalize_p(p, mask):
    """Mask a probability matrix and renormalize (``network.jl:252-261``)."""
    masked = p * mask.astype(p.dtype)
    total = jnp.sum(masked, axis=-1, keepdims=True)
    p_invalid = 1.0 - jnp.squeeze(total, -1)
    uniform = mask.astype(p.dtype) / jnp.maximum(
        jnp.sum(mask, axis=-1, keepdims=True), 1)
    pnorm = jnp.where(total > 0, masked / jnp.maximum(total, 1e-30), uniform)
    return pnorm, p_invalid
