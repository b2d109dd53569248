"""Multi-host runtime initialization.

The reference fans self-play out to worker machines with Julia's
``Distributed`` stdlib — a master process ships closures (including network
weights) to workers over TCP and fetches results back
(``/root/reference/src/simulations.jl:252-290``,
``src/AlphaZero.jl:8``).  The TPU-native equivalent is *multi-controller
SPMD*: every host runs the SAME program, ``jax.distributed.initialize``
wires the hosts into one runtime, and a single ``jax.sharding.Mesh`` spans
every chip of every host.  There is no master, no closure shipping, and no
result fetching — the self-play batch, the replay buffer and the learner
minibatches are sharded over the global ``data`` axis and all data movement
happens as XLA collectives over ICI/DCN inside the jitted programs.

Usage (same command on every host)::

    python -m alphazero_tpu.scripts.cli train connect-four \
        --distributed <coordinator_ip:port>,<num_processes>,<process_id>

or with no argument on TPU pods, where ``jax.distributed.initialize()``
auto-discovers the topology from the environment.
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-controller runtime (idempotent).

    With no arguments, relies on the TPU pod metadata / cluster env vars
    that ``jax.distributed.initialize`` knows how to read; explicit
    arguments support generic clusters.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: must run before ANY backend-initializing jax call (jax.devices,
    # device_put, ...) — do not probe jax.process_count() here
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def parse_spec(spec: str):
    """Parse the ``--distributed host:port,nprocs,pid`` CLI value."""
    parts = spec.split(",")
    if len(parts) == 1 and parts[0] in ("auto", ""):
        return {}
    if len(parts) != 3:
        raise ValueError(
            "--distributed expects 'auto' or 'host:port,num_processes,"
            f"process_id', got {spec!r}")
    return dict(coordinator_address=parts[0],
                num_processes=int(parts[1]),
                process_id=int(parts[2]))


def global_mesh(n_devices: Optional[int] = None, model: int = 1):
    """A mesh over (up to) all *global* devices — every chip on every host
    of the initialized runtime."""
    return make_mesh(n_devices, model=model)
