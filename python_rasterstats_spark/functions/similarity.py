"""Similarity search over embedding columns (array<float>).

- ``cosine_neighbors``: brute-force cosine against a broadcast query set —
  the exact baseline. All math in float64 JVM higher-order functions
  (zip_with + aggregate); no Python in the hot path.
- ``cosine_topk``: row_number-windowed top-k per query.
- ``lsh_ann``: random-hyperplane LSH bucketing — the scale path: queries
  only compare against their bucket. Deterministic planes derived from
  xxhash64 so executors agree without shipping matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_neighbors(
    emb: DataFrame,
    *,
    query_max_id: int = 5,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) pairs with cosine ≥ threshold; queries are the
    rows with id < query_max_id (broadcast side)."""
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    return (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_r"))
    )


def cosine_topk(
    emb: DataFrame,
    *,
    query_max_id: int = 5,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (ties broken by id)."""
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_r"))
    )


def lsh_buckets(
    emb: DataFrame,
    *,
    nplanes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i) where
    plane_i[d] is a deterministic pseudo-random ±1 from xxhash64(i, d).

    Pure JVM expressions; the bucket key concentrates similar vectors so a
    downstream self-join only compares within buckets (the IVF/LSH scale
    path for ANN at 10^12 rows)."""
    dims = F.size(F.col(vec_col))
    # per-plane signed sum: Σ_d v[d] * (±1 from hash(plane, d))
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.sequence(F.lit(0), dims - 1),
                    lambda v, d: v.cast("double")
                    * F.when(
                        F.xxhash64(F.lit(i), d).bitwiseAND(F.lit(1)) == 1, 1.0
                    ).otherwise(-1.0),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(nplanes)
    ]
    bucket = None
    for i, b in enumerate(bits):
        term = F.shiftleft(b, i)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        bucket.alias("bucket"),
    )


def lsh_bits(vec_col, nplanes: int):
    """Bit array of ``nplanes`` random-hyperplane signs as ONE JVM
    expression: bit i = sign(v · plane_i), plane_i[d] = ±1 from
    xxhash64(i, d). Evaluating all planes inside a single ``transform``
    keeps Catalyst from re-expanding the per-plane fold once per consumer
    (the multiband near-dup explodes bands from this array)."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dims = F.size(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(nplanes - 1)),
        lambda i: F.when(
            F.aggregate(
                F.zip_with(
                    col,
                    F.sequence(F.lit(0), dims - 1),
                    lambda v, d: v.cast("double")
                    * F.when(
                        F.xxhash64(i, d).bitwiseAND(F.lit(1)) == 1, 1.0
                    ).otherwise(-1.0),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def lsh_ann(
    emb: DataFrame,
    *,
    nplanes: int = 8,
    query_max_id: int = 5,
    threshold: float = 0.25,
) -> DataFrame:
    """Approximate neighbors: compare only within LSH buckets."""
    b = lsh_buckets(emb, nplanes=nplanes)
    q = b.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "bucket",
    )
    n = b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"), "bucket"
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    return (
        F.broadcast(q)
        .join(n, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_r"))
    )
