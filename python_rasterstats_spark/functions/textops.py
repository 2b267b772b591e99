"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has an ANSI-SQL
equivalent in ``__spark_entry__.oracle_sql`` for DuckDB differential checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a")


def _toks(col: str = "text"):
    return F.split(F.trim(F.col(col)), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counting (whitespace tokenizer)."""
    toks = _toks()
    return docs.select(
        "doc_id",
        F.size(toks).alias("token_cnt"),
        F.size(F.array_distinct(toks)).alias("uniq_token_cnt"),
        F.round(
            F.length(F.regexp_replace(F.trim("text"), r"\s+", ""))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, repetition."""
    toks = _toks()
    stop_cnt = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    )
    return docs.select(
        "doc_id",
        F.col("n_chars"),
        F.size(toks).alias("word_cnt"),
        stop_cnt.alias("stop_cnt"),
        F.round(stop_cnt / F.size(toks), 6).alias("stop_ratio"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "distinct_ratio"
        ),
        F.when(F.size(F.array_distinct(toks)) / F.size(toks) < 0.3, "repetitive")
        .when(F.size(toks) < 20, "short")
        .otherwise("ok")
        .alias("quality_bucket"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic (en vs und)."""
    toks = _toks()
    en_score = F.round(
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))) / F.size(toks),
        6,
    )
    return docs.select(
        "doc_id",
        en_score.alias("en_score"),
        F.when(en_score > 0.0, "en").otherwise("und").alias("lang_pred"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — an order/duplication-insensitive content key."""
    toks = _toks()
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp"),
    )


# GPT-2-style pre-tokenization, simplified to the regex subset that Java
# (Spark) and RE2 (DuckDB) evaluate identically: letter runs, digit runs,
# single other-symbols
SUBWORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_stats(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: regex pre-tokenization into letter runs /
    digit runs / punctuation symbols (the shape of a GPT-2 pre-tokenizer),
    still pure JVM (regexp_extract_all in codegen)."""
    pieces = F.regexp_extract_all("text", F.lit(SUBWORD_RE), 0)
    return docs.select(
        "doc_id",
        F.size(pieces).alias("subword_cnt"),
        F.size(F.array_distinct(pieces)).alias("uniq_subword_cnt"),
        F.size(F.filter(pieces, lambda x: x.rlike("^[^A-Za-z0-9]$"))).alias(
            "punct_cnt"
        ),
    )


def winnow_fingerprints(docs: DataFrame, *, k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every k-token gram, slide a w-window over the hash
    sequence, keep each window's minimum — a position-robust fingerprint
    set whose size is ~2/(w+1) of the grams. Hashes are md5 hex strings so
    the lexicographic window-min is engine-portable (DuckDB twin in
    oracle_sql). One row per (doc_id, fp)."""
    toks = _toks()
    kgrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    hashes = F.transform(kgrams, F.md5)
    mins = F.transform(
        F.sequence(F.lit(0), F.size(hashes) - w),
        lambda i: F.array_min(F.slice(hashes, i + 1, w)),
    )
    return (
        docs.filter(F.size(toks) >= k + w - 1)
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )
