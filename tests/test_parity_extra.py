"""Extra parity cases mirroring reference tests not covered elsewhere
(test_point.py:15-55 unitxy quadrants, test_utils.py CSV, io error cases)."""

import numpy as np
import pytest

from python_rasterstats_spark import api
from python_rasterstats_spark import geom as G
from python_rasterstats_spark import kernel as K


def test_unitxy_quadrants():
    """Reference tests/test_point.py:15-55 — the 2×2 window and unit-square
    placement for a point in each quadrant of a cell."""
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 4.0)  # 4x4 grid, origin top-left
    # upper-left quadrant of cell (1,1): x in (1, 1.5), y in (2.5, 3)
    win, (ux, uy) = K.point_window_unitxy(1.25, 2.75, aff)
    assert win == ((0, 2), (0, 2))
    assert 0.5 <= ux <= 1.0 and 0.0 <= uy <= 0.5
    # upper-right quadrant: x in (1.5, 2)
    win, (ux, uy) = K.point_window_unitxy(1.75, 2.75, aff)
    assert win == ((0, 2), (1, 3))
    assert 0.0 <= ux <= 0.5
    # lower-left quadrant: y in (2, 2.5)
    win, (ux, uy) = K.point_window_unitxy(1.25, 2.25, aff)
    assert win == ((1, 3), (0, 2))
    assert 0.5 <= uy <= 1.0
    # lower-right quadrant
    win, (ux, uy) = K.point_window_unitxy(1.75, 2.25, aff)
    assert win == ((1, 3), (1, 3))
    assert 0.0 <= ux <= 0.5 and 0.5 <= uy <= 1.0


def test_bilinear_window_consistency():
    """Reference test_point.py:72-96: bilinear at any in-cell offset stays
    between the 4 neighbor values and equals the cell value at its center."""
    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 100, size=(6, 6))
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 6.0)
    for x, y in [(2.5, 3.5), (2.9, 3.1), (2.1, 3.9)]:
        win, (ux, uy) = K.point_window_unitxy(x, y, aff)
        block = K.boundless_array(arr, win, -999.0)
        v = K.bilinear(block, ux, uy)
        assert block.min() - 1e-9 <= v <= block.max() + 1e-9
    # exact center → exact cell value
    win, (ux, uy) = K.point_window_unitxy(2.5, 3.5, aff)
    block = K.boundless_array(arr, win, -999.0)
    assert K.bilinear(block, ux, uy) == pytest.approx(arr[2, 2], abs=1e-12)


def test_stats_to_csv_categorical():
    """Reference tests/test_utils.py:19-31 — union of keys, sorted header."""
    stats = [{"count": 1, 1.0: 2}, {"count": 3, 2.0: 4}]
    csv_text = api.stats_to_csv(stats)
    lines = csv_text.strip().split("\r\n")
    assert lines[0] == "1.0,2.0,count"
    assert len(lines) == 3


def test_invalid_vector_inputs():
    """Reference test_zonal.py:56-70 — nonexistent / nonsense inputs."""
    with pytest.raises(ValueError):
        list(G.read_features("/does/not/exist.shp"))
    with pytest.raises(ValueError):
        list(G.read_features(1.0))


def test_ndarray_without_affine():
    """Reference test_zonal.py:238-243."""
    import numpy as np

    with pytest.raises(ValueError):
        api.zonal_stats([G.box(0, 0, 1, 1)], np.zeros((3, 3)))


def test_percentile_empty_zone_none():
    """Reference test_zonal.py:378-385 — percentile on all-nodata zone is
    None while count is 0."""
    arr = np.full((4, 4), -1.0)
    out = K.zonal_stats_one(
        G.box(0, 0, 4, 4), arr, (1.0, 0.0, 0.0, 0.0, -1.0, 4.0),
        nodata=-1.0, stats=["count", "percentile_90"],
    )
    assert out["count"] == 0 and out["percentile_90"] is None


def test_geo_interface_objects():
    """Reference test_io.py:165-181 / test_zonal.py:562-571 — objects
    exposing __geo_interface__ (shapely/geopandas stand-ins)."""

    class FakeGeom:
        __geo_interface__ = {"type": "Point", "coordinates": (1.0, 2.0)}

    class FakeCollection:
        __geo_interface__ = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "properties": {"a": 1},
                 "geometry": {"type": "Point", "coordinates": (1.0, 2.0)}},
            ],
        }

    feats = list(G.read_features(FakeGeom()))
    assert feats[0]["geometry"]["type"] == "Point"
    feats = list(G.read_features(FakeCollection()))
    assert feats[0]["properties"] == {"a": 1}


def test_range_identity():
    """Reference test_zonal.py:182-191 — range == max - min, with and
    without min/max requested."""
    rng = np.random.default_rng(5)
    arr = rng.uniform(0, 50, (8, 8))
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 8.0)
    poly = G.box(0.2, 0.2, 7.8, 7.8)
    both = K.zonal_stats_one(poly, arr, aff, nodata=-1.0,
                             stats=["min", "max", "range"])
    only = K.zonal_stats_one(poly, arr, aff, nodata=-1.0, stats=["range"])
    assert both["range"] == both["max"] - both["min"] == only["range"]