"""Regression tests for the round-1 ADVICE findings.

1. (high) nodata OVERRIDE != dataset nodata with missing/partial tiles:
   boundless fill must use the EFFECTIVE nodata (reference io.py:331-340),
   so fill pixels never count as valid data.
2. (low) boundless=False raises for windows beyond the dataset extent
   (reference io.py:323-326) in the distributed zonal path too.
3. (low) categorical keys preserve the raster dtype (reference
   main.py:237-248 keys.item()): int keys for integer rasters.
4. (low) integer rasters accumulate sum in int64 (reference
   main.py:210-215, 262-267) so sums beyond 2^53 stay exact.
5. (medium) zone_func defaults to whole-zone 'gather' semantics
   (reference main.py:217-228); 'elementwise' is the opt-in scale path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_rasterstats_spark import geom as G
from python_rasterstats_spark import kernel as K
from python_rasterstats_spark.api import gen_zonal_stats, zonal_stats
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


def test_nodata_override_with_boundless_fill(spark):
    """ADVICE #1 repro: dataset nodata=50, query override nodata=60, zone
    extends beyond the extent (missing tiles + edge padding). Fill pixels
    must be masked under the OVERRIDE, dataset-nodata pixels become valid."""
    arr = np.arange(1, 101, dtype=np.float32).reshape(10, 10)  # 1..100
    # plant both sentinel values inside the zone window
    arr[2, 2] = 50.0  # dataset nodata — VALID under the override
    arr[2, 3] = 60.0  # override nodata — masked
    tiles, datasets = raster_to_tables(
        spark, arr, AFF, dataset="ov", nodata=50.0, tile=4
    )
    # box extends 3 px past the left/top edge → missing tiles + padding
    zone = G.box(-3.0, 4.0, 6.0, 13.0)
    got = zonal_stats_df(
        _zones_df(spark, [zone]), tiles, datasets, dataset="ov",
        stats=["count", "min", "max", "mean", "sum", "nodata"], nodata=60.0,
    ).collect()[0].asDict()
    want = K.zonal_stats_one(
        zone, arr, AFF, nodata=60.0,
        stats=["count", "min", "max", "mean", "sum", "nodata"],
    )
    assert got["count"] == want["count"]
    assert got["min"] == want["min"]
    assert got["max"] == want["max"]
    assert got["sum"] == pytest.approx(want["sum"], rel=1e-12)
    assert got["mean"] == pytest.approx(want["mean"], rel=1e-12)
    assert got["nodata"] == want["nodata"]
    # sanity: the fill never leaks in as data
    assert got["min"] != -999.0 and got["min"] != 60.0


def test_nodata_override_no_dataset_nodata(spark):
    """Override on a corpus with NO dataset nodata: fill = override."""
    arr = np.full((8, 8), 7.0, dtype=np.float32)
    tiles, datasets = raster_to_tables(spark, arr, AFF, dataset="nn", tile=4)
    zone = G.box(-2.0, 4.0, 4.0, 9.5)  # straddles the left edge
    got = zonal_stats_df(
        _zones_df(spark, [zone]), tiles, datasets, dataset="nn",
        stats=["count", "min", "nodata"], nodata=-5.0,
    ).collect()[0].asDict()
    want = K.zonal_stats_one(zone, arr, AFF, nodata=-5.0,
                             stats=["count", "min", "nodata"])
    assert got["count"] == want["count"]
    assert got["min"] == want["min"] == 7.0
    assert got["nodata"] == want["nodata"] > 0


def test_boundless_false_raises_beyond_extent(spark):
    """Distributed zonal matches reference io.py:323-326 and the point
    operator: boundless=False + window beyond extent → ValueError."""
    arr = np.ones((8, 8), dtype=np.float32)
    tiles, datasets = raster_to_tables(spark, arr, AFF, dataset="be", tile=4)
    zone = G.box(-3.0, 4.0, 4.0, 9.0)
    df = zonal_stats_df(
        _zones_df(spark, [zone]), tiles, datasets, dataset="be",
        stats=["count"], boundless=False,
    )
    with pytest.raises(Exception, match="outside dataset extent"):
        df.collect()
    # inside the extent it still works
    ok = zonal_stats_df(
        _zones_df(spark, [G.box(1.0, 4.0, 5.0, 8.0)]), tiles, datasets,
        dataset="be", stats=["count"], boundless=False,
    ).collect()
    assert ok[0]["count"] == 16


def test_categorical_int_keys(spark):
    """Integer raster → integer dict keys, like reference keys.item()."""
    arr = np.array([[1, 1, 2], [2, 2, 3], [3, 3, 3]], dtype=np.int32)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 3.0)
    res = zonal_stats(
        [G.box(0.0, 0.0, 3.0, 3.0)],
        arr, affine=aff, nodata=-1, categorical=True, spark=spark,
    )[0]
    assert res == {1: 2, 2: 3, 3: 4}
    assert all(type(k) is int for k in res)
    # float raster keeps float keys
    resf = zonal_stats(
        [G.box(0.0, 0.0, 3.0, 3.0)],
        arr.astype(np.float32), affine=aff, nodata=-1.0, categorical=True,
        spark=spark,
    )[0]
    assert all(type(k) is float for k in resf)
    # category_map passthrough of unmapped INT keys (reference utils.py:106-114)
    resm = zonal_stats(
        [G.box(0.0, 0.0, 3.0, 3.0)],
        arr, affine=aff, nodata=-1, categorical=True,
        category_map={1: "one"}, spark=spark,
    )[0]
    assert resm == {"one": 2, 2: 3, 3: 4}


def test_int64_sum_exact_beyond_2e53(spark):
    """Sums of large int64 values accumulate in int64 (single float()
    conversion at the end), matching reference main.py:262-267."""
    big = 1 << 53
    arr = np.array([[big, 1], [1, 1]], dtype=np.int64)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 2.0)
    tiles, datasets = raster_to_tables(
        spark, arr, aff, dataset="big", nodata=-1, tile=1
    )
    got = zonal_stats_df(
        _zones_df(spark, [G.box(0.0, 0.0, 2.0, 2.0)]), tiles, datasets,
        dataset="big", stats=["sum", "mean", "count"],
    ).collect()[0].asDict()
    exact = big + 3
    assert got["sum"] == float(exact)  # float64 accumulation would give 2^53
    assert got["mean"] == float(exact) / 4.0
    # oracle path agrees
    want = K.zonal_stats_one(
        G.box(0.0, 0.0, 2.0, 2.0), arr, aff, nodata=-1, stats=["sum", "mean"]
    )
    assert want["sum"] == float(exact)


def test_zone_func_defaults_to_whole_zone_semantics(spark):
    """A NON-elementwise zone_func (centering: x - x.mean()) through the
    default API path equals the reference per-feature semantics. The tile
    grid splits the zone, so the old per-partial default would differ."""
    rng = np.random.default_rng(7)
    arr = rng.uniform(0, 100, size=(10, 10)).astype(np.float32)
    zone = G.box(1.0, 1.0, 9.0, 9.0)

    def center(masked):
        return masked - masked.mean()

    res = zonal_stats(
        [zone], arr, affine=AFF, nodata=-1.0, zone_func=center,
        stats=["count", "min", "max", "mean", "sum"], spark=spark,
    )[0]
    want = K.zonal_stats_one(
        zone, arr, AFF, nodata=-1.0, zone_func=center,
        stats=["count", "min", "max", "mean", "sum"],
    )
    assert res["count"] == want["count"]
    assert res["mean"] == pytest.approx(want["mean"], abs=1e-9)
    assert res["min"] == pytest.approx(want["min"], rel=1e-6)
    assert res["max"] == pytest.approx(want["max"], rel=1e-6)
    # elementwise opt-in still exists and matches for a commuting fn
    def plus2(masked):
        return masked + 2.0

    a = zonal_stats([zone], arr, affine=AFF, nodata=-1.0, zone_func=plus2,
                    stats=["mean"], spark=spark)[0]
    b = zonal_stats([zone], arr, affine=AFF, nodata=-1.0, zone_func=plus2,
                    stats=["mean"], zone_func_mode="elementwise", spark=spark)[0]
    assert a["mean"] == pytest.approx(b["mean"], rel=1e-12)
