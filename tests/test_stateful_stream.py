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
