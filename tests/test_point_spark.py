"""Differential tests: distributed point query vs the single-node oracle
(frozen goldens in expected_point.parquet) — engine analog of the
reference's tests/test_point.py."""

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from python_rasterstats_spark.operators.point import point_query_df


@pytest.fixture(scope="module")
def expected(fixture_dir):
    return pq.read_table(f"{fixture_dir}/expected_point.parquet").to_pandas()


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_point_query_matches_oracle(corpus, expected, interp):
    tiles, zones, datasets = corpus
    qp = zones.filter(F.col("collection") == "query_points")
    got = (
        point_query_df(qp, tiles, datasets, dataset="slope", interpolate=interp)
        .orderBy("zone_id", "vertex_idx")
        .toPandas()
    )
    exp = (
        expected[expected["interpolate"] == interp]
        .sort_values(["zone_id", "vertex_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for g, e in zip(got["value"], exp["value"]):
        gn = g is None or (isinstance(g, float) and math.isnan(g))
        en = e is None or (isinstance(e, float) and math.isnan(e))
        assert gn == en, (g, e)
        if not gn:
            assert float(g) == pytest.approx(float(e), rel=1e-12)


def test_point_query_structural(corpus):
    """None beyond extent; nearest fallback near nodata; line → 3 vertices."""
    tiles, zones, datasets = corpus
    qp = zones.filter(F.col("collection") == "query_points")
    got = (
        point_query_df(qp, tiles, datasets, dataset="slope")
        .orderBy("zone_id", "vertex_idx")
        .toPandas()
    )
    by_zone = {z: grp for z, grp in got.groupby("zone_id")}
    zids = sorted(by_zone)
    # zone layout per fixtures.build_zones query_points
    assert not math.isnan(by_zone[zids[0]]["value"].iloc[0])  # mid-grid
    assert math.isnan(by_zone[zids[1]]["value"].iloc[0])  # nodata block → None
    assert not math.isnan(by_zone[zids[2]]["value"].iloc[0])  # fallback
    assert math.isnan(by_zone[zids[3]]["value"].iloc[0])  # beyond extent
    assert len(by_zone[zids[4]]) == 3  # linestring vertices


def test_point_query_validation(corpus):
    tiles, zones, datasets = corpus
    qp = zones.filter(F.col("collection") == "query_points")
    with pytest.raises(ValueError):
        point_query_df(qp, tiles, datasets, dataset="slope", interpolate="cubic")
    with pytest.raises(ValueError):
        point_query_df(qp, tiles, datasets, dataset="nope")
