"""Streaming windowed aggregation == batch twin (closed windows)."""

import os
import shutil

from pyspark.sql import functions as F

from python_rasterstats_spark.streaming.events import (
    windowed_event_stats_batch, windowed_event_stats_stream,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)
    shutil.copy(f"{SF}/events.parquet", stream_dir)

    q = windowed_event_stats_stream(
        spark, stream_dir, out_dir, ckpt, minutes=10, watermark="0 seconds"
    )
    q.awaitTermination(120)

    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_stats_batch(events, minutes=10).collect()
    }
    streamed = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed, "no windows emitted"
    # every emitted (closed) window must agree exactly with batch
    for key, val in streamed.items():
        assert batch[key] == val, key
    # at most the final (still-open) window per event_type may be withheld
    n_types = events.select("event_type").distinct().count()
    assert len(streamed) >= len(batch) - n_types
