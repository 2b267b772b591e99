"""Watermarked windowed aggregation over an event stream.

The reference is batch-only (SURVEY.md §2.7); this demonstrates the
engine's Structured-Streaming surface on the driver's ``events`` table
shape (event_id, ts, user_id, event_type, value, props): tumbling-window
counts/sums with late-data tolerance, runnable in availableNow catch-up
mode so batch == streaming results are testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_stats_batch(events: DataFrame, *, minutes: int = 10) -> DataFrame:
    """Batch twin of the streaming aggregation (for differential tests)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )


def windowed_event_stats_stream(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    minutes: int = 10,
    watermark: str = "30 minutes",
):
    """Streaming variant: parquet file source → watermark → tumbling window
    → append-mode parquet sink; availableNow trigger drains what's there."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(stream_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
