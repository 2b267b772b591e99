"""applyInPandasWithState custom stateful operator: streaming first-seen
exact dedup equals the batch dedup (functions/dedup.dedup_keep) when
arrival respects doc_id order, and cross-batch duplicates are suppressed
by the state store (not just within one micro-batch)."""

import os

from pyspark.sql import functions as F

from python_rasterstats_spark.functions.dedup import dedup_keep
from python_rasterstats_spark.streaming.stateful import dedup_stream

SF = "/root/testdata/sf0.001"


def test_streaming_dedup_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    # plant exact duplicates (new ids, same text) arriving in the LAST
    # batch — the corpus itself is dup-free at this sf
    dups = (docs.filter(F.col("doc_id") < 40)
            .withColumn("doc_id", F.col("doc_id") + 10_000))
    docs_aug = docs.unionByName(dups)
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    # arrival files in doc_id order (so first-seen == global min)
    bounds = [0, n // 3, 2 * n // 3, 20_000]
    for i in range(3):
        (docs_aug.filter((F.col("doc_id") >= bounds[i])
                         & (F.col("doc_id") < bounds[i + 1]))
         .coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(stream_dir, f"_staging{i}")))
        # move the part file in as one arrival unit
        src = [f for f in os.listdir(os.path.join(stream_dir, f"_staging{i}"))
               if f.endswith(".parquet")][0]
        os.rename(os.path.join(stream_dir, f"_staging{i}", src),
                  os.path.join(stream_dir, f"batch{i}.parquet"))

    out_dir = str(tmp_path / "out")
    q = dedup_stream(spark, stream_dir, out_dir,
                     str(tmp_path / "chk"))
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    want = dedup_keep(docs_aug)
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want_ids = sorted(r["doc_id"] for r in want.collect())
    assert got_ids == want_ids
    assert len(got_ids) == n  # the 40 planted dups were all suppressed


def test_streaming_dedup_suppresses_cross_batch_dups(spark, tmp_path):
    rows1 = [(0, "alpha beta", "en", "s", 10), (1, "gamma", "en", "s", 5)]
    rows2 = [(2, "alpha beta", "en", "s", 10), (3, "delta", "en", "s", 5)]
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    for i, rows in enumerate((rows1, rows2)):
        (spark.createDataFrame(rows, ddl).coalesce(1)
         .write.mode("overwrite").parquet(str(tmp_path / f"s{i}")))
        src = [f for f in os.listdir(tmp_path / f"s{i}")
               if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / f"s{i}" / src),
                  os.path.join(stream_dir, f"b{i}.parquet"))
    out_dir = str(tmp_path / "out")
    q = dedup_stream(spark, stream_dir, out_dir, str(tmp_path / "chk"))
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    # doc 2 (same text as doc 0, LATER batch) suppressed by the state store
    assert kept == [0, 1, 3]


def _drop_batch(spark, tmp_path, stream_dir, name, rows):
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    stage = tmp_path / f"_stage_{name}"
    (spark.createDataFrame(rows, ddl).coalesce(1)
     .write.mode("overwrite").parquet(str(stage)))
    src = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(str(stage / src), os.path.join(stream_dir, f"{name}.parquet"))


def test_state_rows_bounded_by_distinct_hashes(spark, tmp_path):
    """State-growth contract: N batches with duplicates leave ONE state
    row per distinct hash, never per document (read back through the
    state-store data source — the same store the checkpoint persists)."""
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    chk = str(tmp_path / "chk")
    texts = ["alpha", "beta", "gamma"]
    rows = []
    did = 0
    for b in range(4):  # 4 batches × all 3 texts = 12 docs, 3 distinct
        batch = []
        for t in texts:
            batch.append((did, t, "en", "s", len(t)))
            did += 1
        rows.append(batch)
    for i, batch in enumerate(rows):
        _drop_batch(spark, tmp_path, stream_dir, f"b{i}", batch)
    q = dedup_stream(spark, stream_dir, str(tmp_path / "out"), chk)
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(chk)
    assert state.count() == len(texts)  # 12 docs in, 3 state rows
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert kept == [0, 1, 2]


def test_ttl_evicts_idle_state_and_reemits(spark, tmp_path):
    """Bounded-state mode: a hash idle past ttl_ms is evicted (state row
    gone) and a duplicate arriving after eviction re-emits as a fresh
    keeper — the documented freshness/recall trade."""
    import time

    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def run():
        q = dedup_stream(spark, stream_dir, out, chk, ttl_ms=300)
        q.awaitTermination(120)

    _drop_batch(spark, tmp_path, stream_dir, "b0",
                [(0, "omega", "en", "s", 5)])
    run()
    time.sleep(1.0)  # let the 300 ms idle TTL lapse
    # unrelated data: triggers timeout processing for the idle hash
    _drop_batch(spark, tmp_path, stream_dir, "b1",
                [(1, "psi", "en", "s", 3)])
    run()
    import hashlib

    omega_hash = hashlib.md5(b"omega").hexdigest()
    state = spark.read.format("statestore").load(chk)
    # the idle 'omega' hash is evicted (availableNow may also run a
    # trailing batch that times out 'psi' — both prove bounded state)
    assert (
        state.filter(F.col("key.text_hash") == omega_hash).count() == 0
    )
    assert state.count() <= 1
    # a post-eviction duplicate of 'omega' re-emits
    _drop_batch(spark, tmp_path, stream_dir, "b2",
                [(2, "omega", "en", "s", 5)])
    run()
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [0, 1, 2]  # doc 2 kept BECAUSE doc 0's state was evicted
