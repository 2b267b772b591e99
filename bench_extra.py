"""Per-query isolation bench (guide §1.4): times each headline query with
phase breakdown — DataFrame construction (driver-side collects + plan
building) vs action — counts Spark jobs per query, and dumps
`.explain("formatted")` to plans/r06/. bench.py itself is FROZEN for the
driver's measurement; all numbers cited in OPTIMIZATION_r06.md from this
file are builder-side evidence only.

Usage: python bench_extra.py [--plans] [queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(REPO, "plans", "r06")


def make_spark(cpus, corpus_dir):
    # identical config to bench.py so numbers are comparable
    from bench import make_spark as bench_make_spark

    return bench_make_spark(cpus, corpus_dir)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    dump_plans = "--plans" in sys.argv
    suffix = "_after" if "--after" in sys.argv else "_before"
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    from python_rasterstats_spark.fixtures import ensure_bench_corpus
    from python_rasterstats_spark.sources.tables import load_corpus

    corpus_dir, meta = ensure_bench_corpus("sf0.1")
    spark = make_spark(CPUS, corpus_dir)
    sc = spark.sparkContext

    from bench import warm

    warm(spark, CPUS)

    tiles, zones, datasets = load_corpus(spark, corpus_dir)
    tables = (tiles, zones, datasets)

    from python_rasterstats_spark.operators.zonal import zonal_stats_df
    from python_rasterstats_spark.operators.point import point_query_df
    from python_rasterstats_spark.functions import dedup, similarity, textops
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    ALL_STATS = (
        "count min max mean sum std median majority minority unique range "
        "percentile_25 percentile_90".split()
    )

    def mk_zonal_default():
        return zonal_stats_df(
            zones, tiles, datasets, dataset="bench",
            stats=["count", "min", "max", "mean"],
        )

    def mk_zonal_all_stats():
        return zonal_stats_df(
            zones, tiles, datasets, dataset="bench", stats=ALL_STATS
        )

    def mk_zonal_smj():
        return zonal_stats_df(
            zones, tiles, datasets, dataset="bench",
            stats=["count", "min", "max", "mean"], broadcast_zones=False,
        )

    def mk_point_query():
        return point_query_df(
            zones.filter(F.col("collection") == "small").limit(500),
            tiles, datasets, dataset="bench",
        )

    builders = {
        "zonal_default": mk_zonal_default,
        "zonal_all_stats": mk_zonal_all_stats,
        "zonal_smj": mk_zonal_smj,
        "point_query": mk_point_query,
        "doc_dedup_exact": lambda: dedup.exact_dups(docs),
        "doc_minhash_lsh": lambda: dedup.minhash_lsh_candidates(docs),
        "doc_token_stats": lambda: textops.token_stats(docs),
        "ann_cosine": lambda: similarity.cosine_neighbors(
            emb, query_max_id=20, threshold=0.25
        ),
    }
    if only:
        builders = {k: v for k, v in builders.items() if k in only}

    # warm the zonal path like bench.py does
    if any(k.startswith(("zonal", "point")) for k in builders):
        from bench import run_zonal

        run_zonal(spark, corpus_dir, ["count"], tables, zone_limit=64)

    os.makedirs(PLANS_DIR, exist_ok=True)
    results = {}
    for name, mk in builders.items():
        sc.setJobDescription(f"bench_extra:{name}")
        reps = []
        for rep in range(3):
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = mk()
            t1 = time.perf_counter()
            noop(df)
            t2 = time.perf_counter()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            reps.append(
                {
                    "build_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "jobs": j1 - j0,
                }
            )
            if rep == 0 and dump_plans:
                with open(
                    os.path.join(PLANS_DIR, f"{name}{suffix}.txt"), "w"
                ) as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")
                    ))
        best = min(reps, key=lambda r: r["total_s"])
        results[name] = {"best": best, "reps": reps}
        print(f"{name}: {json.dumps(results[name]['best'])}", flush=True)
    print(json.dumps({k: v["best"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
