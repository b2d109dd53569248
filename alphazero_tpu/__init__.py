"""alphazero_tpu — a TPU-native AlphaZero framework.

A from-scratch re-design of the capabilities of AlphaZero.jl
(jonathan-laurent/AlphaZero.jl, mounted read-only at /root/reference) for
TPU hardware: pure-functional vectorized game environments, fully batched
array MCTS, a device-resident replay buffer and a jitted actor-learner loop,
sharded over device meshes with GSPMD.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the flagship connect-four program takes
# minutes to compile; cache it across processes/sessions.  Opt out with
# ALPHAZERO_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("ALPHAZERO_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "ALPHAZERO_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
