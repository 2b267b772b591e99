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


def _tokenized(docs: DataFrame, *extra_cols):
    """(doc_id[, extra...], _toks) with the split projected ONCE per row:
    operators below reference the token array several times, and each
    reference to the raw split EXPRESSION re-splits the text — a
    projected column is split once and read many times. Same arrays."""
    return docs.select("doc_id", *extra_cols, _toks().alias("_toks"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counting (whitespace tokenizer)."""
    toks = F.col("_toks")
    return _tokenized(
        docs, F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).alias("_nws")
    ).select(
        "doc_id",
        F.size(toks).alias("token_cnt"),
        F.size(F.array_distinct(toks)).alias("uniq_token_cnt"),
        F.round(F.col("_nws") / F.size(toks), 6).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, repetition."""
    toks = F.col("_toks")
    stop_cnt = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    )
    return _tokenized(docs, "n_chars").select(
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
    toks = F.col("_toks")
    en_score = F.round(
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))) / F.size(toks),
        6,
    )
    return _tokenized(docs).select(
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


def sequence_pack(
    docs: DataFrame, *, budget: int = 256, buckets: int = 8
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM training batches: assign
    documents to fixed-token-budget bins so a downstream loader can
    concatenate each bin into one ~``budget``-token training sequence.

    Scale shape: documents are deterministically bucketed (``doc_id %
    buckets`` — swap in ``xxhash64`` for non-integer keys), ordered within
    the bucket by doc_id, and binned by exclusive running token count:
    ``bin_id = floor(excl_cumsum / budget)``. The window partitions by
    bucket, so no global sort and no single-partition bottleneck — each of
    the ``buckets`` packing streams runs independently, and assignments
    are deterministic under any cluster size. Returns one row per
    (bucket, bin_id) with doc/token tallies."""
    toks = F.size(_toks())
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        docs.select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(buckets)).alias("bucket"),
            toks.alias("tok"),
        )
        .withColumn(
            "excl", F.coalesce(F.sum("tok").over(w), F.lit(0)).cast("long")
        )
        .withColumn("bin_id", F.floor(F.col("excl") / F.lit(budget)))
    )
    return binned.groupBy("bucket", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").cast("long").alias("tok_sum"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Per-document top TF-IDF term: tf = in-doc term count, idf =
    ln((N+1)/(df+1)) + 1 (smoothed), winner by (rounded score desc, term
    asc) — the rounding happens BEFORE ranking so the order is stable
    across engines. Two shuffles at scale: one term-keyed df aggregation
    (map-side combined) and one doc-keyed window; the df side could be
    broadcast when the vocabulary is small."""
    from pyspark.sql import Window

    terms = docs.select(
        "doc_id", F.explode(_toks()).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.distinct().groupBy("term").agg(F.count("*").alias("df"))
    # N rides the plan as a broadcast 1-row aggregate — no driver collect,
    # the whole query stays one lazy DAG
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = tf.join(df_, "term").join(F.broadcast(n_docs)).withColumn(
        "score_r",
        F.round(
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1)) + 1.0),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_r").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tf", "df", "score_r")
    )


def contamination_check(
    docs: DataFrame, *, n: int = 5, train_pred=None, test_pred=None
) -> DataFrame:
    """Train/test contamination scan (the n-gram-overlap decontamination
    step every eval-aware training pipeline runs): a test document is
    contaminated when any of its word ``n``-grams appears verbatim in the
    training corpus. Grams are md5-hashed (fixed-width keys, and DuckDB
    computes the identical digest for the oracle); the train side
    collapses to DISTINCT gram hashes before the equi-join, so join input
    is the training gram vocabulary, not the corpus — broadcastable when
    small, a plain hash join otherwise. Default split: even doc_id =
    train, odd = test. One row per test doc with overlap tallies."""
    # tokens are projected to a column first: a lambda referencing the
    # split EXPRESSION re-splits the text once per gram (O(tokens²) per
    # doc); referencing the attribute splits once per row. element_at
    # replaces slice+copy. Same gram strings, same md5s.
    tokd = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("_toks")
    ).filter(F.size("_toks") >= n)
    tk = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(tk, i + F.lit(j + 1)) for j in range(n)]
            )
        ),
    )
    base = tokd.select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    if train_pred is None:
        train_pred = F.pmod(F.col("doc_id"), F.lit(2)) == 0
    if test_pred is None:
        test_pred = F.pmod(F.col("doc_id"), F.lit(2)) == 1
    train_grams = (
        base.filter(train_pred).select("g").distinct()
        .withColumn("hit", F.lit(1))
    )
    # one pass over the exploded test grams: the left join marks hits and
    # a single aggregation yields both tallies (no second gram scan, no
    # final doc_id join)
    agg = (
        base.filter(test_pred)
        .join(train_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").cast("long").alias("n_overlap"),
        )
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_grams"), 6).alias(
            "contam_ratio_r"
        ),
        (F.col("n_overlap") > 0).alias("contaminated"),
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) evaluate identically: no backrefs, no lookaround. Order
# matters (each pattern runs on the previous one's output): ipv4 before
# phone, or dotted IPs with 3-digit octets scrub as <PHONE>; the phone
# tail is a grouped optional segment so it can't eat a bare trailing
# separator.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone",
     r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{1,4})?"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction (the scrubbing pass every public-corpus training
    pipeline runs before tokenization): emails, phone numbers, IPv4
    addresses and SSN-shaped ids are replaced with ``<TYPE>`` sentinels,
    with per-type match counts for audit. Pure JVM ``regexp_replace`` /
    ``regexp_count`` — codegen, no shuffle, trivially scales; patterns
    apply in declaration order (email first, so its digits can't be
    re-matched as phone fragments)."""
    text_col = F.col("text")
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
            .cast("long").alias(f"n_{name}")
        )
        text_col = F.regexp_replace(text_col, pat, f"<{name.upper()}>")
    out = docs.select("doc_id", *counts, F.md5(text_col).alias("scrubbed_md5"))
    total = sum(F.col(f"n_{name}") for name, _ in PII_PATTERNS)
    return out.withColumn("had_pii", total > 0)


def winnow_fingerprints(docs: DataFrame, *, k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every k-token gram, slide a w-window over the hash
    sequence, keep each window's minimum — a position-robust fingerprint
    set whose size is ~2/(w+1) of the grams. Hashes are md5 hex strings so
    the lexicographic window-min is engine-portable (DuckDB twin in
    oracle_sql). One row per (doc_id, fp)."""
    # staged projections: with the k-gram hash array inlined as an
    # EXPRESSION, the window-min lambda re-evaluates every md5 once per
    # window position (O(tokens × w) md5s per doc, on top of the per-gram
    # re-split) — projecting tokens then hashes as attributes makes each
    # md5 computed exactly once per row. Identical fingerprint strings.
    tokd = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("_toks")
    ).filter(F.size("_toks") >= k + w - 1)
    tk = F.col("_toks")
    kgrams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + F.lit(j + 1)) for j in range(k)]
        ),
    )
    hashed = tokd.select("doc_id", F.transform(kgrams, F.md5).alias("_hashes"))
    hs = F.col("_hashes")
    mins = F.transform(
        F.sequence(F.lit(0), F.size(hs) - w),
        lambda i: F.array_min(F.slice(hs, i + 1, w)),
    )
    return hashed.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
