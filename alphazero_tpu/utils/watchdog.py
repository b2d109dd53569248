"""Stuck-dispatch watchdog: failure detection for hung device programs.

The reference's failure story is checkpoint/resume after a *crash*
(``src/ui/session.jl:110-118``); it has no detection for a *hang*.  On real
TPU deployments hangs happen — e.g. a TPU worker process dying mid-program
leaves the client blocked forever in a futex wait (observed on the v5e
tunnel; see NOTES.md).  Since a blocked XLA dispatch cannot be interrupted
from Python, the only safe recovery is process exit + resume from the last
session checkpoint: the watchdog aborts the process with a distinctive exit
code that a supervisor (``scripts/train_flagship.py --supervise``) turns
into an automatic restart.
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Callable, Optional

# EX_TEMPFAIL: "try again" — the supervisor restarts on exactly this code
EXIT_STUCK = 75


class DispatchWatchdog:
    """Context manager that fires if the guarded block runs too long.

    The default action prints a diagnostic and ``os._exit(EXIT_STUCK)``
    (exception-proof: a blocked C++ dispatch never sees Python signals).
    ``action`` is injectable for tests.
    """

    def __init__(self, timeout_s: Optional[float], label: str,
                 action: Optional[Callable[[], None]] = None):
        self.timeout_s = timeout_s
        self.label = label
        self.action = action or self._abort
        self._timer: Optional[threading.Timer] = None

    def _abort(self):
        print(f"\nWATCHDOG: '{self.label}' exceeded "
              f"{self.timeout_s:.0f}s — device dispatch presumed stuck "
              f"(TPU worker hang?); exiting {EXIT_STUCK} for supervised "
              "restart + session resume.", file=sys.stderr, flush=True)
        os._exit(EXIT_STUCK)

    def __enter__(self):
        if self.timeout_s is not None:
            self._timer = threading.Timer(self.timeout_s, self.action)
            self._timer.daemon = True
            self._timer.start()
        return self

    def __exit__(self, *exc):
        if self._timer is not None:
            self._timer.cancel()
        return False


def dispatch_timeout(default: float = 900.0) -> Optional[float]:
    """Steady-state per-dispatch budget; ``ALPHAZERO_DISPATCH_TIMEOUT``
    overrides (seconds; "0"/"off" disables)."""
    v = os.environ.get("ALPHAZERO_DISPATCH_TIMEOUT")
    if v is None:
        return default
    if v.strip().lower() in ("0", "off", "none", ""):
        return None
    return float(v)


def first_call_timeout(steady: Optional[float],
                       compile_budget: float = 3600.0) -> Optional[float]:
    """The first dispatch of a program includes its XLA compile (minutes,
    cold); give it a much larger budget."""
    if steady is None:
        return None
    return max(steady, compile_budget)
