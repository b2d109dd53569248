"""Store semantics of the pons benchmark tooling under ``--limit``.

The training-curve sweep thinks a 250-position prefix per bucket
(``--limit``); stored full-bucket moves must satisfy limited reruns, a
short store must trigger a rethink, and scoring must refuse to silently
under-score when the store covers fewer positions than requested
(pons_benchmark.py; protocol: ``pons_benchmark.jl:49-75``).
"""

import pytest

from alphazero_tpu.scripts import pons_benchmark as PB


def _bench(n, stage="end", difficulty="easy"):
    # entries: (move-string, exact score); content is irrelevant to the
    # store-coverage logic under test
    return PB.Bench(stage=stage, difficulty=difficulty,
                    entries=[(str(i + 1), 1) for i in range(n)])


def test_think_skips_when_store_covers_request():
    calls = []

    def think(states, rng):  # never reached: coverage check fires first
        calls.append(1)
        raise AssertionError("think should have been skipped")

    store = {"agent": {"end/easy": [0] * 10}}
    out = PB.think_player("agent", think, [_bench(10)], game=None,
                          lanes=4, moves_store=store)
    assert out["end/easy"] == [0] * 10
    assert not calls


def test_think_reruns_when_store_is_short():
    # a 4-position store cannot satisfy a 10-position request
    store = {"agent": {"end/easy": [0] * 4}}
    bench = _bench(10)
    with pytest.raises(Exception):
        # think=None blows up when (correctly) invoked — the point is that
        # the skip branch must NOT be taken
        PB.think_player("agent", None, [bench], game=None, lanes=4,
                        moves_store=store)


def test_score_refuses_short_store(tmp_path):
    cache = PB.SolveCache("")  # unsaved in-memory cache
    with pytest.raises(SystemExit, match="cover only"):
        PB.score_moves("agent", {"end/easy": [0] * 4}, [_bench(10)], cache)


def test_score_full_store_covers_limited_bench(tmp_path):
    # stored full-bucket moves score fine against a --limit'ed bench: the
    # zip truncates to the bench prefix the moves were computed on
    cache = PB.SolveCache("")
    cache.data = {e[0] + "1": 1 for e in _bench(10).entries}
    errs = PB.score_moves("agent", {"end/easy": [0] * 10},
                          [_bench(4)], cache, log=lambda *a, **k: None)
    assert len(errs) == 1 and 0.0 <= errs[0] <= 1.0
