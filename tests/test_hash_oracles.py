"""The pure-Python XXH64 oracle (tools/oracle_hashes.py) must track Spark's
F.xxhash64 exactly — it underwrites the committed expected outputs for
doc_minhash_lsh / doc_simhash / ann_lsh (VERDICT r1 'Next round #4')."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from oracle_hashes import (  # noqa: E402
    Long, _signed, lsh_ann_expected, minhash_lsh_expected, simhash_expected,
    spark_xxhash64, xxh64,
)


def test_xxh64_published_vectors():
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    # >=32-byte input exercises the 4-lane stripe path
    assert xxh64(b"x" * 40, 0) != xxh64(b"x" * 40, 1)


def test_xxh64_matches_spark(spark):
    strings = ["", "a", "abc", "hello world", "x" * 31, "y" * 32, "z" * 100,
               "tok1 tok2 tok3", "-123,456"]
    ints = [0, 1, -1, 5, 2**31 - 1, -2**31]
    longs = [0, 42, -7, 2**62, -(2**62)]
    df = spark.createDataFrame(
        [(s, i, l) for s, i, l in zip(strings + [""] * 0,
                                      (ints * 2)[: len(strings)],
                                      (longs * 2)[: len(strings)])],
        "s string, i int, l long",
    )
    rows = df.select(
        "s", "i", "l",
        F.xxhash64("s").alias("hs"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", "i").alias("hsi"),
        F.xxhash64("i", "s", "l").alias("hisl"),
    ).collect()
    for r in rows:
        assert _signed(spark_xxhash64(r["s"])) == r["hs"], r["s"]
        assert _signed(spark_xxhash64(r["i"])) == r["hi"], r["i"]
        assert _signed(spark_xxhash64(Long(r["l"]))) == r["hl"], r["l"]
        assert _signed(spark_xxhash64(r["s"], r["i"])) == r["hsi"]
        assert _signed(spark_xxhash64(r["i"], r["s"], Long(r["l"]))) == r["hisl"]


@pytest.fixture()
def tiny_docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # dup
        "the quick brown fox leaps over the lazy dog again and again",  # near
        "completely different words in this one document here now ok",
        "short one two",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_pipeline_matches_spark(spark, tiny_docs):
    from python_rasterstats_spark.functions.dedup import minhash_lsh_candidates

    rows, df = tiny_docs
    got = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_lsh_candidates(df, n=3, k=32, bands=8).collect()
    )
    want = sorted(minhash_lsh_expected(rows, n=3, k=32, bands=8))
    assert got == want
    assert any(a == 0 and b == 1 and e == 1.0 for a, b, e in got)  # exact dup


def test_simhash_matches_spark(spark, tiny_docs):
    from python_rasterstats_spark.functions.dedup import simhash

    rows, df = tiny_docs
    got = sorted((r["doc_id"], r["simhash"]) for r in simhash(df).collect())
    want = sorted(simhash_expected(rows))
    assert got == want


def test_lsh_ann_matches_spark(spark):
    import numpy as np

    from python_rasterstats_spark.functions.similarity import lsh_ann

    rng = np.random.default_rng(3)
    vecs = [(i, [float(np.float32(x)) for x in rng.normal(size=16)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_r"])
        for r in lsh_ann(df, nplanes=8, query_max_id=5, threshold=0.1).collect()
    )
    want = sorted(lsh_ann_expected(
        [(i, v) for i, v in vecs], nplanes=8, query_max_id=5, threshold=0.1
    ))
    assert got == want
