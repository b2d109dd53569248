"""Optimiser specs: Adam and cyclic-Nesterov SGD.

Mirrors the reference optimiser surface (``network.jl:158-190``) and its
Flux training loops (``src/networks/flux.jl:68-95``), rebuilt on optax.  The
cyclic schedules are a function of the step index *within one training phase*
of ``n`` steps, exactly as ``CyclicSchedule`` is constructed per ``train!``
call in the reference.
"""

from __future__ import annotations

import dataclasses

import optax

from ..utils.schedules import CyclicSchedule


@dataclasses.dataclass(frozen=True)
class OptimiserSpec:
    def make(self, num_steps: int) -> optax.GradientTransformation:
        raise NotImplementedError

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["type"] = type(self).__name__
        return d

    @staticmethod
    def from_json(d: dict) -> "OptimiserSpec":
        d = dict(d)
        kind = d.pop("type")
        cls = {c.__name__: c for c in (Adam, CyclicNesterov)}[kind]
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class Adam(OptimiserSpec):
    """(``network.jl:183-190``)"""

    lr: float

    def make(self, num_steps: int) -> optax.GradientTransformation:
        del num_steps
        return optax.adam(self.lr)


@dataclasses.dataclass(frozen=True)
class CyclicNesterov(OptimiserSpec):
    """SGD with cyclic LR and cyclic Nesterov momentum
    (``network.jl:166-181``, ``flux.jl:78-95``): over an ``n``-step phase the
    LR ramps base→high→base→low while momentum moves high→low→high."""

    lr_base: float
    lr_high: float
    lr_low: float
    momentum_low: float
    momentum_high: float

    def make(self, num_steps: int) -> optax.GradientTransformation:
        n = max(int(num_steps), 2)
        lr = CyclicSchedule(self.lr_base, self.lr_high, self.lr_low, n=n)
        mom = CyclicSchedule(self.momentum_high, self.momentum_low,
                             self.momentum_high, n=n)
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=lambda i: lr(i + 1),
            momentum=lambda i: mom(i + 1),
            nesterov=True,
        )
