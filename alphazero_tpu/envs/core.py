"""TPU-native game interface: pure functions over array states.

This is the re-design of the reference's ``GameInterface``
(``/root/reference/src/game.jl:34-336``).  The reference exposes a stateful
``AbstractGameEnv`` mutated by ``play!``; on TPU everything must be a pure
function over fixed-shape arrays so that thousands of boards can be stepped in
lockstep under ``jax.vmap``/``jax.jit``.

A game is described by a :class:`Game` record of pure functions, each
operating on a *single* (unbatched) state pytree.  Batching happens at the
call site with ``vmap``; no function here may use data-dependent python
control flow.

Conventions
-----------
* ``State`` is a game-specific ``NamedTuple`` of arrays.  It must contain
  enough information to derive termination, legality and rewards; states are
  fixed-shape and comparable by value (the persistence/hashability contract of
  ``src/game.jl:96-109,238-248`` becomes "states are plain arrays").
* Players are ``int32``: ``0`` = white, ``1`` = black.  Rewards are always
  expressed from *white's* perspective (``src/game.jl:1-7``).
* ``step`` takes an rng key so stochastic games (grid-world,
  ``games/grid-world/game.jl:43-51``) fit the same signature; deterministic
  games ignore it.
* ``reward(state)`` is the white-POV reward emitted by the transition *into*
  ``state`` (the reference queries ``GI.white_reward`` right after ``play!``,
  ``src/play.jl:313``).
* Observations (``observe``) are float32 tensors from the *current player's*
  point of view, mirroring ``GI.vectorize_state``
  (e.g. ``games/connect-four/game.jl:234-241``).
* ``canonical_key`` returns a small int32 vector uniquely identifying the
  state (player included); it powers replay-buffer position averaging
  (``src/memory.jl:99-112``) via sort-based merging instead of a hash table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

State = Any  # a game-specific NamedTuple of arrays
Action = jnp.ndarray  # int32 scalar
PRNGKey = jax.Array

WHITE = 0
BLACK = 1


@dataclasses.dataclass(frozen=True)
class Game:
    """A game definition as a bundle of pure, vmappable functions.

    Required function signatures (all unbatched):

    - ``init() -> State``: initial state (``src/game.jl:50``).
    - ``step(state, action, key) -> State``: apply an action
      (``src/game.jl:140-145``).  Must be a no-op-safe total function for any
      *legal* action on a non-terminal state; behaviour on illegal input is
      unspecified but must not crash.
    - ``observe(state) -> f32[...obs_shape]``: current-player-POV tensor
      (``src/game.jl:116-124``).
    - ``legal_mask(state) -> bool[num_actions]`` (``src/game.jl:108-114``).
    - ``terminated(state) -> bool`` (``src/game.jl:70-74``).
    - ``reward(state) -> f32``: white reward of the last transition
      (``src/game.jl:146-152``).
    - ``to_play(state) -> i32``: 0 (white) or 1 (black)
      (``src/game.jl:98-106``).
    - ``canonical_key(state) -> i32[key_size]``: exact state identity.
    - ``heuristic_value(state) -> f32``: current-player heuristic for minmax
      baselines (``src/game.jl:154-160``); optional, defaults to 0.
    - ``symmetrize(state, pi) -> (State_s, pi_s)`` stacked over
      ``num_symmetries`` leading dim: the state symmetries together with the
      permuted full-action policy vector (``src/game.jl:172-197``).  Optional.
    - ``random_symmetry(state, key) -> State``: uniformly random symmetry
      image, for in-game board flips (``src/game.jl:327-336``).  Optional.
    """

    name: str
    num_actions: int
    obs_shape: Tuple[int, ...]
    two_players: bool
    max_game_length: int
    key_size: int
    num_symmetries: int

    init: Callable[[], State]
    step: Callable[[State, Action, PRNGKey], State]
    observe: Callable[[State], jnp.ndarray]
    legal_mask: Callable[[State], jnp.ndarray]
    terminated: Callable[[State], jnp.ndarray]
    reward: Callable[[State], jnp.ndarray]
    to_play: Callable[[State], jnp.ndarray]
    canonical_key: Callable[[State], jnp.ndarray]
    # optional random initial-state distribution (e.g. grid-world's uniform
    # start, ``games/grid-world/game.jl:30-36``); None = deterministic init
    init_random: Optional[Callable[[PRNGKey], State]] = None
    heuristic_value: Optional[Callable[[State], jnp.ndarray]] = None
    symmetrize: Optional[Callable[[State, jnp.ndarray], Tuple[State, jnp.ndarray]]] = None
    random_symmetry: Optional[Callable[[State, PRNGKey], State]] = None

    # Host-side (non-jax) helpers for UIs; optional.
    render: Optional[Callable[[State], str]] = None
    action_string: Optional[Callable[[int], str]] = None
    parse_action: Optional[Callable[[str], Optional[int]]] = None
    read_state: Optional[Callable[[str], Optional[State]]] = None

    # ---- derived helpers -------------------------------------------------

    def init_batch(self, batch_size: int, key: Optional[PRNGKey] = None) -> State:
        """A batch of fresh initial states (leading dim ``batch_size``).

        Uses ``init_random`` (per-lane keys) when defined and a key is given.
        """
        if self.init_random is not None and key is not None:
            return jax.vmap(self.init_random)(
                jax.random.split(key, batch_size))
        s0 = self.init()
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), s0)

    def flip_white_pov(self, state, x):
        """Sign-flip a white-POV scalar into current-player POV."""
        return jnp.where(self.to_play(state) == WHITE, x, -x)


def num_legal_actions(game: Game, state) -> jnp.ndarray:
    return jnp.sum(game.legal_mask(state).astype(jnp.int32))


def uniform_policy(game: Game, state) -> jnp.ndarray:
    """Uniform distribution over legal actions, zeros elsewhere."""
    mask = game.legal_mask(state)
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return mask.astype(jnp.float32) / n


def apply_temperature(pi: jnp.ndarray, tau) -> jnp.ndarray:
    """Temperature-anneal a probability vector (``src/util.jl:98-110``).

    ``tau=1`` is the identity; ``tau=0`` collapses onto the argmax.  Works
    under jit for traced ``tau`` (uses a select rather than branching).
    """
    tau = jnp.asarray(tau, pi.dtype)
    greedy = jax.nn.one_hot(jnp.argmax(pi, -1), pi.shape[-1], dtype=pi.dtype)
    # pi ** (1/tau), guarded against 0**x and division by ~0
    safe_tau = jnp.maximum(tau, 1e-6)
    powed = jnp.where(pi > 0, pi, 1.0) ** (1.0 / safe_tau)
    powed = jnp.where(pi > 0, powed, 0.0)
    annealed = powed / jnp.maximum(jnp.sum(powed, -1, keepdims=True), 1e-30)
    return jnp.where(tau <= 1e-6, greedy, annealed)


def sample_from(pi: jnp.ndarray, key: PRNGKey) -> jnp.ndarray:
    """Categorical sample from a (possibly unnormalized) probability vector.

    Mirrors ``Util.rand_categorical`` + ``fix_probvec``
    (``src/util.jl:68-90``): a zero vector falls back to uniform.
    """
    s = jnp.sum(pi, -1, keepdims=True)
    pi = jnp.where(s > 0, pi / jnp.maximum(s, 1e-30), jnp.ones_like(pi) / pi.shape[-1])
    return jax.random.categorical(key, jnp.log(jnp.maximum(pi, 1e-30)), axis=-1)


def pack_base3(cells: jnp.ndarray, extra: Sequence[jnp.ndarray] = ()) -> jnp.ndarray:
    """Pack a flat vector of base-3 digits (+ extra small ints) into int32 words.

    Used by board games to build ``canonical_key``: 16 trits fit in one int32
    word (3**16 < 2**26).  ``extra`` scalars (e.g. current player) are
    appended as their own words.
    """
    cells = cells.astype(jnp.int32).reshape(-1)
    n = cells.shape[0]
    words = []
    for start in range(0, n, 16):
        chunk = cells[start:start + 16]
        w = jnp.zeros((), jnp.int32)
        for i in range(chunk.shape[0]):
            w = w * 3 + chunk[i]
        words.append(w)
    words += [jnp.asarray(e, jnp.int32).reshape(()) for e in extra]
    return jnp.stack(words)
