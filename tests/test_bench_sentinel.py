"""Contention-sentinel retry/flag semantics of the bench harness (pure
python — no Spark): dirty reps are retried within budget, surviving
contamination is flagged, clean reps never are."""

import bench


def _with_burns(monkeypatch, singles, parallels):
    it_s, it_p = iter(singles), iter(parallels)
    monkeypatch.setattr(bench, "_burn_once", lambda: next(it_s))
    monkeypatch.setattr(bench, "_burn_parallel", lambda threads=8: next(it_p))


def test_clean_reps_unflagged(monkeypatch):
    _with_burns(monkeypatch, [0.3] * 10, [0.6] * 10)
    sec, result, contended = bench.timed_clean(
        lambda: 42, (0.3, 0.6), reps=3
    )
    assert result == 42 and not contended and sec >= 0


def test_dirty_rep_is_retried_then_clean(monkeypatch):
    calls = []
    # rep 1 dirty (single burn 0.5 > 1.2*0.3) -> retried; retry clean
    _with_burns(
        monkeypatch,
        [0.5, 0.5] + [0.3] * 10,
        [0.6] * 10,
    )
    sec, result, contended = bench.timed_clean(
        lambda: calls.append(1) or len(calls), (0.3, 0.6), reps=1
    )
    assert len(calls) == 2  # the dirty rep re-ran the query
    assert not contended  # the accepted rep was clean


def test_exhausted_retry_budget_flags(monkeypatch):
    _with_burns(monkeypatch, [0.5] * 20, [0.6] * 20)
    sec, result, contended = bench.timed_clean(
        lambda: 1, (0.3, 0.6), reps=1, max_retries=2
    )
    assert contended  # still contaminated after the budget -> flagged


def test_parallel_burn_alone_triggers_retry(monkeypatch):
    # single-thread burns clean, parallel burn dirty (the multi-core
    # contention mode the single probe misses)
    _with_burns(monkeypatch, [0.3] * 20, [1.0, 0.6, 0.6])
    calls = []
    sec, result, contended = bench.timed_clean(
        lambda: calls.append(1), (0.3, 0.6), reps=1
    )
    assert len(calls) == 2 and not contended
