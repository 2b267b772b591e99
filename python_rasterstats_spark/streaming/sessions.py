"""Gap-based sessionization of the events stream.

Spark-first: the built-in ``session_window`` (works identically in batch
and Structured Streaming) — no custom state management needed. The DuckDB
oracle in __spark_entry__ recomputes sessions independently with
lag/cumsum window functions, so this operator gets a true differential
check of the session semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def sessionize(events: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """One row per (user, session): events closer than ``gap`` chain into
    one session."""
    return (
        events.groupBy(
            "user_id", F.session_window("ts", gap).alias("sw")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events", "sum_value")
    )


def tumbling_counts(
    events: DataFrame, *, width: str = "1 hour"
) -> DataFrame:
    """Per-user tumbling-window event aggregation — the built-in
    ``F.window`` (identical semantics in batch and Structured Streaming
    with a watermark). One row per (user, window-start)."""
    return (
        events.groupBy("user_id", F.window("ts", width).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("w_start"),
            "n_events", "sum_value",
        )
    )


def sessionize_stream(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
):
    """Streaming variant: session windows close when the watermark passes
    the gap; availableNow drains a directory for batch-equivalence tests."""
    from .events import EVENTS_DDL

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(stream_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events", "sum_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
