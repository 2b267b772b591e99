"""Bucket-grained checkpoint/resume for the batch zonal job (r2 verdict
#4, SURVEY §4 step 7): kill after a partial state commit, restart, get the
uninterrupted answer — completed buckets are skipped, not recomputed."""

import os

import pytest

from python_rasterstats_spark.plans.lineage import (
    BucketAbort, CheckpointRunner, checkpointed_zonal_bucketed,
)

STATS = ["count", "mean", "sum", "min", "max", "median"]


def _fix_dir():
    from python_rasterstats_spark.fixtures import ensure_fixtures

    return ensure_fixtures(
        os.path.join(os.path.dirname(__file__), "..", "data", "zonal_fixtures")
    )


def test_kill_and_resume_matches_uninterrupted(spark, tmp_path):
    corpus = _fix_dir()

    # uninterrupted reference run
    ref, _ = checkpointed_zonal_bucketed(
        spark, corpus, str(tmp_path / "ref"), dataset="slope", stats=STATS,
        buckets=4,
    )
    want = sorted(map(tuple, ref.collect()))
    assert len(want) > 4  # several zones, spread over buckets

    # killed run: aborts after 2 bucket commits
    with pytest.raises(BucketAbort):
        checkpointed_zonal_bucketed(
            spark, corpus, str(tmp_path / "killed"), dataset="slope",
            stats=STATS, buckets=4, fail_after=2,
        )
    part_dir = tmp_path / "killed" / "stage=partials"
    committed = [p for p in os.listdir(part_dir) if p.startswith("bucket=")]
    assert len(committed) == 2  # partial state really is on disk

    # resume: same base dir, no fault injection
    got_df, runner = checkpointed_zonal_bucketed(
        spark, corpus, str(tmp_path / "killed"), dataset="slope",
        stats=STATS, buckets=4,
    )
    got = sorted(map(tuple, got_df.collect()))
    assert got == want  # bit-for-bit the uninterrupted result

    # and the resume actually SKIPPED the committed buckets
    events = [
        (m.get("bucket"), m["event"])
        for m in runner.metrics()
        if m["stage"] == "partials"
    ]
    skipped = [b for b, e in events if e == "skipped"]
    committed_later = [b for b, e in events if e == "committed"]
    assert sorted(skipped)[:2] == [0, 1]
    assert set(committed_later) & {2, 3}


def test_second_run_skips_everything(spark, tmp_path):
    corpus = _fix_dir()
    base = str(tmp_path / "full")
    a, _ = checkpointed_zonal_bucketed(
        spark, corpus, base, dataset="slope", stats=STATS, buckets=4,
    )
    a_rows = sorted(map(tuple, a.collect()))
    b, runner = checkpointed_zonal_bucketed(
        spark, corpus, base, dataset="slope", stats=STATS, buckets=4,
    )
    assert sorted(map(tuple, b.collect())) == a_rows
    events = [m["event"] for m in runner.metrics() if m["stage"] == "partials"]
    assert events.count("skipped") >= 4  # second run computed nothing
