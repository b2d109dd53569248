"""The AlphaZero loss, exactly as decomposed in the reference.

``/root/reference/src/learning.jl:53-90``:

    L = (mean(W)/Wmean) * (Lp + Lv + Lreg + Linv)

with ``Lp`` the KL between recorded MCTS policies and the network policy
(computed as cross-entropy minus the dataset-constant MCTS entropy ``Hp``),
``Lv`` a weighted MSE on renormalized values, ``Lreg`` an L2 penalty on all
parameters (the reference regularizes *all* params, see the comment at
``learning.jl:67-75``), and ``Linv`` the mean probability mass put on
invalid actions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1.1920929e-07  # eps(Float32), as used by the reference's klloss


class LossHP(NamedTuple):
    """Static loss hyperparameters (subset of ``LearningParams``)."""

    l2_regularization: float
    nonvalidity_penalty: float
    rewards_renormalization: float


class LossParts(NamedTuple):
    L: jnp.ndarray
    Lp: jnp.ndarray
    Lv: jnp.ndarray
    Lreg: jnp.ndarray
    Linv: jnp.ndarray


def wmean(x, w):
    return jnp.sum(x * w) / jnp.sum(w)


def entropy_wmean(pi, w):
    """Weighted mean entropy of policy rows (``learning.jl:63``)."""
    ent = -jnp.sum(pi * jnp.log(pi + EPS), axis=-1)
    return wmean(ent, w)


def l2_penalty(params):
    return sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(params))


def losses(phat, pinv, vhat, params, hp: LossHP, Wmean, Hp, W, P, V
           ) -> LossParts:
    """Loss decomposition given network outputs (``learning.jl:67-90``).

    - ``phat [b, A]``: masked+renormalized network policy
    - ``pinv [b]``: probability mass on invalid actions
    - ``vhat [b]``: value head output
    - ``W [b]``: sample weights; ``P [b, A]``: target policies; ``V [b]``:
      target values.
    """
    v = V / hp.rewards_renormalization
    vh = vhat / hp.rewards_renormalization
    lp = -jnp.sum(P * jnp.log(phat + EPS), axis=-1)
    Lp = wmean(lp, W) - Hp
    Lv = wmean(jnp.square(vh - v), W)
    Lreg = (hp.l2_regularization * l2_penalty(params)
            if hp.l2_regularization else jnp.zeros(()))
    Linv = (hp.nonvalidity_penalty * wmean(pinv, W)
            if hp.nonvalidity_penalty else jnp.zeros(()))
    L = (jnp.mean(W) / Wmean) * (Lp + Lv + Lreg + Linv)
    return LossParts(L=L, Lp=Lp, Lv=Lv, Lreg=Lreg, Linv=Linv)
