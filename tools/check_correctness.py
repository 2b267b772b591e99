"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB (views pre-registered over the same sf parquet), compare row count,
column set, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<null>")
            elif isinstance(v, float):
                vals.append(f"{v:.9g}")
            elif isinstance(v, (list, tuple)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from python_rasterstats_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            status = f"rows-only ({len(sdf)} rows)"
            ok = len(sdf) >= 0
        else:
            odf = con.execute(oracles[name]).df()
            ok = True
            msgs = []
            if len(sdf) != len(odf):
                ok = False
                msgs.append(f"rowcount {len(sdf)} vs {len(odf)}")
            if sorted(sdf.columns) != sorted(odf.columns):
                ok = False
                msgs.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            if ok:
                cs, co = canon(sdf), canon(odf)
                if cs != co:
                    ok = False
                    diffs = [
                        (x, y) for x, y in zip(cs, co) if x != y
                    ][:3]
                    msgs.append(f"values differ, first: {diffs}")
            status = f"OK ({len(sdf)} rows)" if ok else "; ".join(msgs)
        print(f"{'PASS' if ok else 'FAIL':4} {name:24} {status}")
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
