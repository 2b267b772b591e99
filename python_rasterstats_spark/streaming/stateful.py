"""Custom stateful streaming operator: first-seen exact dedup with
``applyInPandasWithState``.

The built-in streaming tools cover windows (F.window), sessions
(session_window) and the foreachBatch fold (incremental.py); this module
covers the remaining Structured-Streaming surface — ARBITRARY per-key
state. The operator keeps one tiny state row per content hash (the keeper
doc_id) and suppresses every later duplicate, within a micro-batch and
across micro-batches alike; state lives in the streaming state store, so
it scales with the number of DISTINCT documents and survives restarts via
the checkpoint.

Semantics: "first seen wins" — the keeper of a hash is the smallest
doc_id in the FIRST micro-batch where the hash appears (== the global
smallest when arrival respects doc_id order, which is how the
batch-equivalence test feeds it). The batch twin is
functions/dedup.dedup_keep.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_OUT_DDL = "text_hash string, doc_id long, n_chars long"
_STATE_DDL = "keeper_id long"


def _first_seen(key, pdfs, state: GroupState):
    """Per content-hash group: emit the keeper row once, ever."""
    if state.exists:
        # hash already has a keeper — consume and emit nothing
        for _ in pdfs:
            pass
        return
    best_id = None
    best_chars = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        i = pdf["doc_id"].idxmin()
        if best_id is None or pdf["doc_id"].loc[i] < best_id:
            best_id = int(pdf["doc_id"].loc[i])
            best_chars = int(pdf["n_chars"].loc[i])
    if best_id is None:
        return
    state.update((best_id,))
    yield pd.DataFrame(
        {"text_hash": [key[0]], "doc_id": [best_id], "n_chars": [best_chars]}
    )


def dedup_keyed(docs: DataFrame) -> DataFrame:
    """(streaming or batch) docs → hash-keyed grouped frame with the
    first-seen stateful dedup applied."""
    hashed = docs.withColumn("text_hash", F.md5("text"))
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen, _OUT_DDL, _STATE_DDL, "append",
        GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source streaming dedup: parquet files dropped into
    ``stream_dir`` are consumed exactly once; kept (first-seen) docs append
    to ``out_dir``. Returns the streaming query (availableNow semantics —
    awaitTermination drains the backlog and stops)."""
    docs = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    kept = dedup_keyed(docs)
    return (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
