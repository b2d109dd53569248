"""Parameter schedules: functions from a nonnegative integer index to a value.

TPU-native re-design of the reference's schedule system
(``/root/reference/src/schedule.jl:12-136``).  Unlike the reference, schedules
here must be evaluable both on the host (python ints, e.g. per-iteration
memory sizes) and *inside a jitted program* (traced ``jnp`` indices, e.g. the
per-turn MCTS temperature evaluated inside the self-play ``scan``).  Every
schedule therefore implements ``__call__(i)`` where ``i`` may be a python int
or a traced jax scalar, using only jnp ops.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Union

import jax.numpy as jnp

Scalar = Union[int, float]


class Schedule:
    """Abstract schedule (reference: ``src/schedule.jl:12``)."""

    def __call__(self, i):
        raise NotImplementedError

    # -- JSON round-trip (tagged unions, as reference src/ui/json.jl:27-35) --
    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["type"] = type(self).__name__
        return d

    @staticmethod
    def from_json(d) -> "Schedule":
        if isinstance(d, (int, float)):
            return ConstSchedule(d)
        d = dict(d)
        kind = d.pop("type")
        cls = {c.__name__: c for c in (ConstSchedule, PLSchedule, StepSchedule)}[kind]
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class ConstSchedule(Schedule):
    """Constant schedule (reference: ``src/schedule.jl:18-22``)."""

    value: Scalar

    def __call__(self, i):
        return self.value


@dataclasses.dataclass(frozen=True)
class PLSchedule(Schedule):
    """Piecewise-linear schedule (reference: ``src/schedule.jl:49-80``).

    Holds value ``ys[0]`` before ``xs[0]`` and ``ys[-1]`` after ``xs[-1]``.
    When every y is an int, values between points are rounded up (ceil), as
    the reference does for integer-typed schedules.
    """

    xs: Sequence[int]
    ys: Sequence[Scalar]

    def __post_init__(self):
        # coerce to tuples: schedules are dict keys in compile caches
        object.__setattr__(self, "xs", tuple(self.xs))
        object.__setattr__(self, "ys", tuple(self.ys))
        assert len(self.xs) == len(self.ys) and len(self.xs) > 0

    @property
    def _integer(self) -> bool:
        return all(isinstance(y, int) for y in self.ys)

    def __call__(self, i):
        if isinstance(i, int):  # host path: exact reference semantics
            xs, ys = list(self.xs), list(self.ys)
            if i <= xs[0]:
                return ys[0]
            if i >= xs[-1]:
                return ys[-1]
            for k in range(len(xs) - 1):
                if xs[k] <= i < xs[k + 1]:
                    y = ys[k] + (ys[k + 1] - ys[k]) / (xs[k + 1] - xs[k]) * (i - xs[k])
                    return math.ceil(y) if self._integer else y
            raise AssertionError
        # traced path (inside jit): linear interp with edge clamping
        y = jnp.interp(
            jnp.asarray(i, jnp.float32),
            jnp.asarray(self.xs, jnp.float32),
            jnp.asarray(self.ys, jnp.float32),
        )
        return jnp.ceil(y) if self._integer else y


@dataclasses.dataclass(frozen=True)
class StepSchedule(Schedule):
    """Step-function schedule (reference: ``src/schedule.jl:107-124``)."""

    start: Scalar
    xs: Sequence[int]
    ys: Sequence[Scalar]

    def __post_init__(self):
        object.__setattr__(self, "xs", tuple(self.xs))
        object.__setattr__(self, "ys", tuple(self.ys))
        assert len(self.xs) == len(self.ys)

    def __call__(self, i):
        if isinstance(i, int):
            out = self.start
            for x, y in zip(self.xs, self.ys):
                if x <= i:
                    out = y
            return out
        vals = jnp.asarray([self.start] + list(self.ys), jnp.float32)
        idx = jnp.searchsorted(jnp.asarray(self.xs), jnp.asarray(i), side="right")
        return vals[idx]


def CyclicSchedule(base, mid, term, *, n, xmid=0.45, xback=0.90) -> PLSchedule:
    """Cyclic LR schedule helper (reference: ``src/schedule.jl:132-136``)."""
    nmid = int(math.floor(xmid * n))
    nback = int(math.floor(xback * n))
    return PLSchedule([1, nmid, nback, n], [base, mid, base, term])


def as_schedule(v) -> Schedule:
    return v if isinstance(v, Schedule) else ConstSchedule(v)
