"""Device-resident experience replay.

Re-design of the reference memory buffer (``/root/reference/src/memory.jl``):
the ``CircularBuffer{TrainingSample}`` becomes a fixed-capacity struct of
arrays living in HBM, written by jitted scatters.  Samples store the *state*
pytree (as the reference does) so observations are recomputed at training
time and symmetry augmentation operates on states.

The reference's hash-table position averaging (``merge_by_state``,
``src/memory.jl:99-112``) becomes a sort-based segment reduction: samples are
lexicographically sorted by their exact ``canonical_key`` and identical states
are averaged with ``segment_sum`` — fixed shapes, no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import config as cfg
from .envs.core import Game


class Replay(NamedTuple):
    """Circular buffer of training samples (``src/memory.jl:35-45``)."""

    states: Any          # pytree [cap, ...]
    pi: jnp.ndarray      # f32 [cap, A] full-action MCTS policy
    z: jnp.ndarray       # f32 [cap] discounted return (current-player POV)
    t: jnp.ndarray       # f32 [cap] remaining moves to game end
    key: jnp.ndarray     # i32 [cap, K] canonical state key
    ptr: jnp.ndarray     # i32 [] next write position
    total: jnp.ndarray   # i32 [] total samples ever pushed
    cur_batch: jnp.ndarray  # i32 [] samples in the latest self-play batch

    @property
    def capacity(self) -> int:
        return self.z.shape[0]

    @property
    def size(self):
        return jnp.minimum(self.total, self.capacity)


class Dataset(NamedTuple):
    """Merged training set: valid entries are compacted at the front."""

    states: Any          # pytree [n, ...]
    pi: jnp.ndarray      # f32 [n, A] (averaged)
    z: jnp.ndarray       # f32 [n]
    t: jnp.ndarray       # f32 [n]
    n_merged: jnp.ndarray  # i32 [n] number of samples merged into each entry
    count: jnp.ndarray   # i32 [] number of valid entries


def init_replay(game: Game, capacity: int) -> Replay:
    s0 = game.init()
    zeros_like_state = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + x.shape, x.dtype), s0)
    return Replay(
        states=zeros_like_state,
        pi=jnp.zeros((capacity, game.num_actions), jnp.float32),
        z=jnp.zeros((capacity,), jnp.float32),
        t=jnp.zeros((capacity,), jnp.float32),
        key=jnp.zeros((capacity, game.key_size), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        total=jnp.zeros((), jnp.int32),
        cur_batch=jnp.zeros((), jnp.int32),
    )


def push(replay: Replay, states, pi, z, t, key, valid) -> Replay:
    """Append ``M`` samples (``valid`` masked) to the circular buffer.

    The jitted analogue of ``push_trace!`` over a whole self-play batch
    (``src/memory.jl:74-87``; the z/t computation happens in selfplay.py).
    Invalid rows are dropped via out-of-bounds scatter indices.
    """
    cap = replay.capacity
    valid = valid.astype(jnp.int32)
    rank = jnp.cumsum(valid) - 1
    nvalid = jnp.sum(valid)
    # if one batch holds more valid samples than the ring (misconfigured
    # buffer; check_params warns), keep only the newest ``cap`` — otherwise
    # wrapped scatter indices would collide nondeterministically
    keep = rank >= nvalid - cap
    idx = jnp.where((valid > 0) & keep,
                    (replay.ptr + rank) % cap, cap)  # cap = drop

    def scat(buf, val):
        return buf.at[idx].set(val, mode="drop")

    return replay._replace(
        states=jax.tree.map(scat, replay.states, states),
        pi=scat(replay.pi, pi),
        z=scat(replay.z, z),
        t=scat(replay.t, t),
        key=scat(replay.key, key),
        ptr=(replay.ptr + nvalid) % cap,
        total=replay.total + nvalid,
        cur_batch=replay.cur_batch + nvalid,
    )


def new_batch(replay: Replay) -> Replay:
    """Mark the start of a new self-play batch (``src/memory.jl:58``)."""
    return replay._replace(cur_batch=jnp.zeros((), jnp.int32))


def resize(game: Game, replay: Replay, new_capacity: int) -> Replay:
    """Grow/shrink the buffer, keeping the newest samples in order
    (``src/training.jl:180-184``).  Host-level (capacities are static)."""
    cap = replay.capacity
    if new_capacity == cap:
        return replay
    empty = init_replay(game, new_capacity)
    size = int(replay.size)
    keep = min(size, new_capacity)
    # oldest kept sample position in the old ring
    start = (int(replay.ptr) - keep) % cap if size >= cap else size - keep
    idx = (start + jnp.arange(keep)) % cap

    def move(dst, src):
        return dst.at[:keep].set(src[idx])

    return Replay(
        states=jax.tree.map(move, empty.states, replay.states),
        pi=move(empty.pi, replay.pi),
        z=move(empty.z, replay.z),
        t=move(empty.t, replay.t),
        key=move(empty.key, replay.key),
        ptr=jnp.asarray(keep % new_capacity, jnp.int32),
        total=jnp.asarray(keep, jnp.int32),
        cur_batch=jnp.minimum(replay.cur_batch, keep),
    )


def _lexsort(cols) -> jnp.ndarray:
    """Stable lexicographic argsort; ``cols[0]`` is most significant."""
    n = cols[0].shape[0]
    perm = jnp.arange(n)
    for col in reversed(cols):
        order = jnp.argsort(col[perm], stable=True)
        perm = perm[order]
    return perm


def _experience_arrays(game: Game, replay: Replay, use_symmetries: bool):
    """Replay contents (+ optional symmetry augmentation,
    ``src/memory.jl:126-130``) as flat arrays with a validity mask."""
    cap = replay.capacity
    valid = jnp.arange(cap) < replay.size
    states, pi, z, t, key = (replay.states, replay.pi, replay.z, replay.t,
                             replay.key)
    if use_symmetries and game.symmetrize is not None and game.num_symmetries:
        S = game.num_symmetries
        sym_states, sym_pi = jax.vmap(game.symmetrize)(states, pi)
        flat_states = jax.tree.map(
            lambda x: x.reshape((cap * S,) + x.shape[2:]), sym_states)
        sym_key = jax.vmap(game.canonical_key)(flat_states)
        states = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), states, flat_states)
        pi = jnp.concatenate([pi, sym_pi.reshape(cap * S, -1)])
        rep = lambda x: jnp.repeat(x, S, axis=0)
        z = jnp.concatenate([z, rep(z)])
        t = jnp.concatenate([t, rep(t)])
        key = jnp.concatenate([key, sym_key])
        valid = jnp.concatenate([valid, rep(valid)])
    return states, pi, z, t, key, valid


def make_dataset(game: Game, replay: Replay, *, use_symmetries: bool,
                 use_position_averaging: bool) -> Dataset:
    """Build the training set: optional symmetry augmentation + position
    averaging (``src/memory.jl:89-130``, ``src/learning.jl:104-108``).

    With averaging, identical states are merged: their ``pi``, ``z``, ``t``
    are averaged and ``n`` counts occurrences.  Jit-compatible.
    """
    states, pi, z, t, key, valid = _experience_arrays(
        game, replay, use_symmetries)
    m = z.shape[0]
    if not use_position_averaging:
        # compact valid entries to the front, n = 1
        order = jnp.argsort(~valid, stable=True)
        return Dataset(
            states=jax.tree.map(lambda x: x[order], states),
            pi=pi[order], z=z[order], t=t[order],
            n_merged=valid[order].astype(jnp.int32),
            count=jnp.sum(valid.astype(jnp.int32)))
    cols = [(~valid).astype(jnp.int32)] + [key[:, i] for i in range(key.shape[1])]
    perm = _lexsort(cols)
    pkey = key[perm]
    pvalid = valid[perm]
    boundary = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(pkey[1:] != pkey[:-1], axis=-1) | (pvalid[1:] != pvalid[:-1])])
    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    ones = pvalid.astype(jnp.float32)
    n = jax.ops.segment_sum(ones, seg, num_segments=m)
    denom = jnp.maximum(n, 1.0)
    mean_of = lambda x: (
        jax.ops.segment_sum(x * ones.reshape((-1,) + (1,) * (x.ndim - 1)),
                            seg, num_segments=m)
        / denom.reshape((-1,) + (1,) * (x.ndim - 1)))
    first_idx = jax.ops.segment_min(jnp.arange(m), seg, num_segments=m)
    first_idx = jnp.minimum(first_idx, m - 1)
    take_first = lambda x: x[perm][first_idx]
    num_segs = seg[-1] + 1
    seg_valid = jnp.arange(m) < num_segs
    # a segment is a real state iff its first element is valid
    real = take_first(valid) & seg_valid
    count = jnp.sum(real.astype(jnp.int32))
    return Dataset(
        states=jax.tree.map(take_first, states),
        pi=mean_of(pi[perm]),
        z=mean_of(z[perm]),
        t=mean_of(t[perm]),
        n_merged=jnp.where(real, n, 0).astype(jnp.int32),
        count=count)


def sample_weights(ds: Dataset, policy: str) -> jnp.ndarray:
    """Per-sample weights (``SamplesWeighingPolicy``, ``src/params.jl:166-177``
    and ``src/learning.jl:22-29``); zero on invalid entries."""
    n = ds.n_merged.astype(jnp.float32)
    if policy == cfg.CONSTANT_WEIGHT:
        w = jnp.ones_like(n)
    elif policy == cfg.LOG_WEIGHT:
        w = jnp.log2(jnp.maximum(n, 1.0)) + 1.0
    elif policy == cfg.LINEAR_WEIGHT:
        w = n
    else:
        raise ValueError(policy)
    return jnp.where(ds.n_merged > 0, w, 0.0)


@functools.lru_cache(maxsize=32)
def _distinct_program(game: Game):
    # jitted (not eager): on a mesh-sharded replay the sort/segment chain
    # must compile into ONE program — op-by-op execution would issue a
    # cross-module collective per primitive, which deadlocks the CPU
    # backend's rendezvous pool at 8 virtual devices
    return jax.jit(lambda replay: make_dataset(
        game, replay, use_symmetries=False,
        use_position_averaging=True).count)


def num_distinct_boards(game: Game, replay: Replay) -> jnp.ndarray:
    """|unique states| in memory (``src/training.jl:261-266``)."""
    return _distinct_program(game)(replay)
