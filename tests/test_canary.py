"""Chip-integrity canary: checks run and pass on the CPU backend
(CPU-vs-CPU is trivially consistent; the value of this test is API/shape
coverage of every check program so the canary never breaks at session
start on the real chip)."""

import numpy as np
import pytest

from alphazero_tpu.utils import canary


def test_validate_chip_cpu_force():
    canary._CACHE.clear()
    res = canary.validate_chip(force=True)
    assert res is not None and len(res) == 5
    names = {r.name for r in res}
    assert names == {"rollout_guard", "i8_scatter", "env_step", "minmax",
                     "search"}
    assert all(r.ok for r in res)
    assert canary.summary(res).startswith("pass")
    # cached on second call
    assert canary.validate_chip(force=True) is res


def test_validate_chip_skips_on_cpu_default(monkeypatch):
    # default (non-forced) call must be a no-op on a CPU runtime
    assert canary.validate_chip() is None
    assert canary.summary(None) == "skipped"


def test_canary_error_formatting(monkeypatch):
    canary._CACHE.clear()
    bad = canary.CheckResult("minmax", False, "3/64 argmax moves diverge",
                             0.1)
    monkeypatch.setattr(
        canary, "_check_minmax", lambda dev: bad)
    with pytest.raises(canary.CanaryError, match="argmax moves diverge"):
        canary.validate_chip(force=True)
    canary._CACHE.clear()
