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


def _first_seen_fn(ttl_ms: int | None):
    """Build the per-group function; with ``ttl_ms`` set, every sighting
    re-arms a processing-time timeout and the state row is dropped once a
    hash goes ``ttl_ms`` without being seen (sliding idle-TTL)."""

    def _first_seen(key, pdfs, state: GroupState):
        """Per content-hash group: emit the keeper row once per state
        lifetime."""
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: drop the keeper row; a later duplicate
            # re-emits as a fresh keeper (the documented recall trade
            # that keeps state rows ≤ the ACTIVE distinct corpus)
            state.remove()
            return
        if state.exists:
            # hash already has a keeper — consume and emit nothing
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # sighting re-arms TTL
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
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"text_hash": [key[0]], "doc_id": [best_id], "n_chars": [best_chars]}
        )

    return _first_seen


def dedup_keyed(docs: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """(streaming or batch) docs → hash-keyed grouped frame with the
    first-seen stateful dedup applied.

    State-growth contract: with ``ttl_ms=None`` the store keeps ONE tiny
    row per distinct content hash forever — exact dedup, state ∝ distinct
    corpus (duplicates never add rows). ``ttl_ms`` bounds that to the
    hashes seen within a sliding idle window via GroupStateTimeout
    (bounded-state mode): a hash idle longer is evicted, and a duplicate
    arriving after eviction re-emits — the standard freshness/recall dial.
    For unbounded-history exactness with bounded state, compact
    periodically against the batch dedup table (functions/dedup.exact_dups
    over the accumulated sink) instead of raising the TTL."""
    hashed = docs.withColumn("text_hash", F.md5("text"))
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen_fn(ttl_ms), _OUT_DDL, _STATE_DDL, "append", timeout
    )


def dedup_stream(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    ttl_ms: int | None = None,
):
    """File-source streaming dedup: parquet files dropped into
    ``stream_dir`` are consumed exactly once; kept (first-seen) docs append
    to ``out_dir``. Returns the streaming query (availableNow semantics —
    awaitTermination drains the backlog and stops). ``ttl_ms`` enables
    the bounded-state mode (see dedup_keyed)."""
    docs = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    kept = dedup_keyed(docs, ttl_ms=ttl_ms)
    return (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
