"""SimpleNet: a dense two-head policy/value network.

Matches the architecture of
``/root/reference/src/networks/architectures/simplenet.jl:37-64``: flatten →
``depth_common+1`` dense(+BN) relu layers → a policy head (dense layers +
softmax over all actions) and a value head (dense layers + tanh scalar).

Note on batch-norm momentum: Flux's ``momentum=m`` updates running stats as
``mu = (1-m)*mu + m*batch`` while flax uses ``mu = m*mu + (1-m)*batch``; specs
here carry the *Flux* convention (as the reference configs do) and convert.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn

from ..envs.core import Game
from .interface import NetworkSpec, kernel_initializer


class _SimpleNet(nn.Module):
    num_actions: int
    width: int
    depth_common: int
    depth_phead: int
    depth_vhead: int
    use_batch_norm: bool
    bn_momentum: float  # flax convention (retention)
    init_scheme: str = "flux"
    policy_init_gain: float = 1.0
    value_init_gain: float = 1.0

    def _dense(self, x, out, train, gain=1.0):
        x = nn.Dense(out, kernel_init=kernel_initializer(
            self.init_scheme, gain))(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum)(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = self._dense(x, self.width, train)
        for _ in range(self.depth_common):
            x = self._dense(x, self.width, train)
        p = x
        for _ in range(self.depth_phead):
            p = self._dense(p, self.width, train)
        p = nn.softmax(nn.Dense(self.num_actions,
                                kernel_init=kernel_initializer(
                                    self.init_scheme,
                                    self.policy_init_gain))(p), axis=-1)
        v = x
        for _ in range(self.depth_vhead):
            # gain on the hidden value denses too (as in the ResNet head):
            # BN after them renormalizes in train mode, but the eval-mode
            # init statistics — what the iteration-1 search sees — scale
            v = self._dense(v, self.width, train,
                            gain=self.value_init_gain)
        v = nn.tanh(nn.Dense(1, kernel_init=kernel_initializer(
            self.init_scheme, self.value_init_gain))(v))
        return p, v[..., 0]


@dataclasses.dataclass(frozen=True)
class SimpleNetSpec(NetworkSpec):
    """Hyperparameters, mirroring ``SimpleNetHP`` (``simplenet.jl:15-22``)."""

    width: int
    depth_common: int
    depth_phead: int = 1
    depth_vhead: int = 1
    use_batch_norm: bool = False
    batch_norm_momentum: float = 0.6  # Flux convention
    # see ResNetSpec / interface.kernel_initializer
    init_scheme: str = "flux"
    policy_init_gain: float = 1.0
    value_init_gain: float = 1.0

    def build(self, game: Game):
        return _SimpleNet(
            num_actions=game.num_actions,
            width=self.width,
            depth_common=self.depth_common,
            depth_phead=self.depth_phead,
            depth_vhead=self.depth_vhead,
            use_batch_norm=self.use_batch_norm,
            bn_momentum=1.0 - self.batch_norm_momentum,
            init_scheme=self.init_scheme,
            policy_init_gain=self.policy_init_gain,
            value_init_gain=self.value_init_gain,
        )
