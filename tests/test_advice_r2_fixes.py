"""Regression tests for the round-2 ADVICE findings.

1. (high) gather-tier mosaic canvas: np.full cast the fill unsafely, so
   integer rasters whose dtype can't represent the effective nodata
   (uint8 + nodata None -> fill -999 wraps to 25) made boundless/missing
   pixels indistinguishable from data. Fixed via kernel.fill_dtype.
2. (medium) kernel.boundless_array padded ragged-edge windows in the
   native dtype with the same wrap hazard (contaminated crosstab and the
   partial zonal path). Fixed centrally in boundless_array; partial_stats
   gains an int_sum hint so promoted blocks of integer rasters keep the
   reference's int64 sum accumulation.
3. (low) simhash / minhash_signatures emit ONE row per input doc again
   (NULL signature for NULL-text / unshingleable docs).
4. (low) point_query_df broadcast hints are gated (broadcast_vertices)
   so the SMJ fallback is reachable for huge vertex sets.
"""

import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_rasterstats_spark import geom as G
from python_rasterstats_spark import kernel as K
from python_rasterstats_spark.api import gen_zonal_stats
from python_rasterstats_spark.operators.crosstab import zonal_crosstab_df
from python_rasterstats_spark.operators.point import point_query_df
from python_rasterstats_spark.operators.zonal import zonal_stats_df
from python_rasterstats_spark.sources.tables import ZONES_DDL, raster_to_tables

AFF = (1.0, 0.0, 0.0, 0.0, -1.0, 10.0)


def _zones_df(spark, geoms):
    return spark.createDataFrame(
        [
            {"zone_id": i, "collection": "t", "geometry_wkb": G.wkb_dumps(g),
             "geom_type": g["type"], "properties": {}}
            for i, g in enumerate(geoms)
        ],
        schema=ZONES_DDL,
    )


def test_fill_dtype_roundtrip():
    assert K.fill_dtype(np.uint8, -999.0) == np.float64
    assert K.fill_dtype(np.uint8, 255.0) == np.uint8
    assert K.fill_dtype(np.int16, -999.0) == np.int16
    assert K.fill_dtype(np.int8, -999.0) == np.float64
    assert K.fill_dtype(np.uint16, -999.0) == np.float64
    assert K.fill_dtype(np.float32, -999.0) == np.float32
    assert K.fill_dtype(np.float32, float("nan")) == np.float32
    assert K.fill_dtype(np.int32, float("nan")) == np.float64
    assert K.fill_dtype(np.int32, 0.5) == np.float64


def test_boundless_array_promotes_unrepresentable_fill():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = K.boundless_array(arr, ((-2, 4), (0, 4)), -999.0)
    assert out.dtype == np.float64
    assert (out[:2] == -999.0).all()
    assert (out[2:] == arr).all()
    # representable fill keeps the native dtype
    out2 = K.boundless_array(arr.astype(np.int16), ((-2, 4), (0, 4)), -999.0)
    assert out2.dtype == np.int16
    assert (out2[:2] == -999).all()


def test_gather_uint8_fill_wrap(spark):
    """ADVICE r2 #1 repro: uint8 raster, nodata None, zone beyond extent,
    gather tier (forced by add_stats). Boundless pixels must stay masked —
    the old unsafe np.full wrapped -999 to 25 and counted pads as data."""
    arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tiles, datasets = raster_to_tables(spark, arr, AFF, dataset="u8", tile=4)
        zone = G.box(-4.0, 6.0, 4.0, 14.0)  # beyond top-left: 16 real px
        gather = list(gen_zonal_stats(
            [zone], arr, affine=AFF,
            stats=["count", "min", "max", "mean", "sum"],
            add_stats={"mymax": lambda m: float(m.max())},
            spark=spark,
        ))[0]
        partial = zonal_stats_df(
            _zones_df(spark, [zone]), tiles, datasets, dataset="u8",
            stats=["count", "min", "max", "mean", "sum"],
        ).collect()[0].asDict()
        want = K.zonal_stats_one(
            zone, arr, AFF, stats=["count", "min", "max", "mean", "sum"]
        )
    assert want["count"] == 16 and want["max"] == 33.0  # arr[0:4, 0:4]
    for k in ("count", "min", "max"):
        assert gather[k] == want[k], k
        assert partial[k] == want[k], k
    assert gather["sum"] == pytest.approx(want["sum"])
    assert partial["sum"] == pytest.approx(want["sum"])
    assert gather["mymax"] == want["max"]


def test_zonal_partial_uint8_ragged_edge_int_sum(spark):
    """Ragged-edge pad promotion + the int_sum hint: a 10x10 uint8 raster
    with tile=4 has 2-px ragged edge tiles; a zone past the bottom-right
    pads INSIDE the edge tiles' nominal extent. Pads must not count, and
    the int64 sum accumulation must still include promoted blocks."""
    arr = (np.arange(100, dtype=np.uint8) % 97).reshape(10, 10)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tiles, datasets = raster_to_tables(spark, arr, AFF, dataset="rg", tile=4)
        zone = G.box(6.0, -2.0, 12.0, 4.0)  # past bottom-right corner
        got = zonal_stats_df(
            _zones_df(spark, [zone]), tiles, datasets, dataset="rg",
            stats=["count", "min", "max", "mean", "sum"],
        ).collect()[0].asDict()
        want = K.zonal_stats_one(
            zone, arr, AFF, stats=["count", "min", "max", "mean", "sum"]
        )
    assert want["count"] == 16  # rows 6..9 x cols 6..9 only
    for k in ("count", "min", "max"):
        assert got[k] == want[k], k
    assert got["sum"] == pytest.approx(want["sum"])
    assert got["mean"] == pytest.approx(want["mean"])


def test_crosstab_ragged_edge_uint8(spark):
    """ADVICE r2 #2: ragged-edge boundless pads in the crosstab kernel must
    not contaminate per-class stats for integer rasters with an
    unrepresentable effective nodata."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=(6, 6)).astype(np.uint8)
    cls = rng.integers(0, 3, size=(6, 6)).astype(np.uint8)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 6.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tv, dv = raster_to_tables(spark, vals, aff, dataset="xv", tile=4)
        tc, dc = raster_to_tables(spark, cls, aff, dataset="xc", tile=4)
    tiles = tv.unionByName(tc)
    datasets = dv.unionByName(dc)
    zone = G.box(0.0, -2.0, 8.0, 6.0)  # beyond bottom/right edges
    got = {
        (r["zone_id"], r["class"]): r.asDict()
        for r in zonal_crosstab_df(
            _zones_df(spark, [zone]), tiles, datasets,
            value_dataset="xv", class_dataset="xc",
            stats=("count", "min", "max", "sum"),
        ).collect()
    }
    # numpy differential: only the 6x6 real raster is valid
    for c in np.unique(cls):
        seg = vals[cls == c].astype(np.float64)
        row = got[(0, float(c))]
        assert row["count"] == seg.size
        assert row["min"] == seg.min()
        assert row["max"] == seg.max()
        assert row["sum"] == pytest.approx(seg.sum())
    assert len(got) == len(np.unique(cls))  # no phantom "wrapped pad" class


def test_simhash_minhash_row_per_doc(spark):
    from python_rasterstats_spark.functions.dedup import (
        minhash_signatures, simhash,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, None), (2, "hi")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert set(sh) == {0, 1, 2}
    assert sh[0] is not None and sh[1] is None and sh[2] is not None
    ms = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs).collect()}
    assert set(ms) == {0, 1, 2}
    assert ms[0] is not None and len(ms[0]) == 32
    assert ms[1] is None and ms[2] is None  # "hi" has < 3 tokens


def test_point_query_smj_regime_matches(spark):
    arr = np.arange(100, dtype=np.float32).reshape(10, 10)
    tiles, datasets = raster_to_tables(
        spark, arr, AFF, dataset="pq", nodata=-1.0, tile=4
    )
    pts = G.wkt_loads("MULTIPOINT (1.5 8.5, 5.2 3.7, 9.9 0.1, -3 2)")
    zones = _zones_df(spark, [pts])
    a = point_query_df(
        zones, tiles, datasets, dataset="pq", interpolate="bilinear",
    ).collect()
    # disable auto-broadcast so the only possible BHJ source is the hint
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b_df = point_query_df(
            zones, tiles, datasets, dataset="pq", interpolate="bilinear",
            broadcast_vertices=False,
        )
        b = b_df.collect()
        plan = b_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # SMJ fallback is reachable
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    key = lambda r: (r["zone_id"], r["vertex_idx"])
    assert sorted((key(r), r["value"]) for r in a) == sorted(
        (key(r), r["value"]) for r in b
    )
