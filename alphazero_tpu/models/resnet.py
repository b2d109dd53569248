"""AlphaGo-Zero-style convolutional residual two-head network.

Matches ``/root/reference/src/networks/architectures/resnet.jl:53-91``:
conv+BN+relu stem; ``num_blocks`` residual blocks of (conv+BN+relu, conv+BN,
skip add, relu); a 1x1-conv policy head → dense → softmax; a 1x1-conv value
head → dense(relu) → dense(1, tanh).

TPU notes: NHWC layout, convolutions run on the MXU; compute dtype is
configurable (bfloat16 by default on TPU) with float32 parameters and
batch-norm statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..envs.core import Game
from .interface import NetworkSpec, kernel_initializer


class _ResNet(nn.Module):
    num_actions: int
    num_filters: int
    num_blocks: int
    kernel: Tuple[int, int]
    policy_filters: int
    value_filters: int
    bn_momentum: float  # flax convention (retention)
    compute_dtype: str = "float32"
    init_scheme: str = "flux"
    policy_init_gain: float = 1.0
    value_init_gain: float = 1.0

    def _conv(self, x, filters, kernel):
        return nn.Conv(filters, kernel, padding="SAME", use_bias=True,
                       kernel_init=kernel_initializer(self.init_scheme),
                       dtype=self.compute_dtype)(x)

    def _bn(self, x, train):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.bn_momentum,
                            dtype=self.compute_dtype)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        nf = self.num_filters
        x = nn.relu(self._bn(self._conv(x, nf, self.kernel), train))
        for _ in range(self.num_blocks):
            y = nn.relu(self._bn(self._conv(x, nf, self.kernel), train))
            y = self._bn(self._conv(y, nf, self.kernel), train)
            x = nn.relu(x + y)
        # policy head (``resnet.jl:79-84``)
        p = nn.relu(self._bn(self._conv(x, self.policy_filters, (1, 1)), train))
        p = p.reshape((p.shape[0], -1))
        p = nn.Dense(self.num_actions, dtype=self.compute_dtype,
                     kernel_init=kernel_initializer(
                         self.init_scheme, self.policy_init_gain))(p)
        p = nn.softmax(p.astype(jnp.float32), axis=-1)
        # value head (``resnet.jl:85-90``)
        v = nn.relu(self._bn(self._conv(x, self.value_filters, (1, 1)), train))
        v = v.reshape((v.shape[0], -1))
        v = nn.relu(nn.Dense(nf, dtype=self.compute_dtype,
                             kernel_init=kernel_initializer(
                                 self.init_scheme,
                                 self.value_init_gain))(v))
        v = nn.tanh(nn.Dense(1, dtype=self.compute_dtype,
                             kernel_init=kernel_initializer(
                                 self.init_scheme,
                                 self.value_init_gain))(v).astype(jnp.float32))
        return p, v[..., 0]


@dataclasses.dataclass(frozen=True)
class ResNetSpec(NetworkSpec):
    """Hyperparameters, mirroring ``ResNetHP`` (``resnet.jl:30-37``)."""

    num_filters: int
    num_blocks: int
    conv_kernel_size: Tuple[int, int] = (3, 3)
    num_policy_head_filters: int = 2
    num_value_head_filters: int = 1
    batch_norm_momentum: float = 0.6  # Flux convention
    compute_dtype: str = "float32"
    # compute dtype for inference-only programs (self-play oracle, arena,
    # benchmarks); params/BN stats stay f32 and are shared with training
    inference_dtype: str = "bfloat16"
    # weight init: "flux" = glorot_uniform everywhere (the reference's
    # FluxLib default, ``Flux.glorot_uniform``); "lecun" = flax defaults
    # (rounds 1-3 behavior).  The head gains scale the final dense kernels
    # of each head; see ``interface.kernel_initializer`` for why they exist.
    init_scheme: str = "flux"
    policy_init_gain: float = 1.0
    value_init_gain: float = 1.0

    def inference_spec(self) -> "ResNetSpec":
        return dataclasses.replace(self, compute_dtype=self.inference_dtype)

    def build(self, game: Game):
        assert all(k % 2 == 1 for k in self.conv_kernel_size)
        return _ResNet(
            num_actions=game.num_actions,
            num_filters=self.num_filters,
            num_blocks=self.num_blocks,
            kernel=tuple(self.conv_kernel_size),
            policy_filters=self.num_policy_head_filters,
            value_filters=self.num_value_head_filters,
            bn_momentum=1.0 - self.batch_norm_momentum,
            compute_dtype=self.compute_dtype,
            init_scheme=self.init_scheme,
            policy_init_gain=self.policy_init_gain,
            value_init_gain=self.value_init_gain,
        )
