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
