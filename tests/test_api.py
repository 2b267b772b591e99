"""API-parity tests — engine analogs of the reference's tests/test_zonal.py
and tests/test_point.py API-level behaviors, run over ndarray inputs."""

import warnings

import numpy as np
import pytest

from python_rasterstats_spark import api
from python_rasterstats_spark import geom as G

AFF = (1.0, 0.0, 0.0, 0.0, -1.0, 10.0)


@pytest.fixture(scope="module")
def arr():
    rng = np.random.default_rng(3)
    a = (rng.normal(size=(10, 10)) * 3 + 20).astype(np.float32)
    a[0, 0] = -9999.0
    return a


@pytest.fixture(scope="module")
def sp(spark):
    return spark


POLY = {
    "type": "Polygon",
    "coordinates": [[(1.2, 1.2), (8.8, 1.2), (8.8, 8.8), (1.2, 8.8), (1.2, 1.2)]],
}


def test_zonal_stats_ndarray(sp, arr):
    out = api.zonal_stats([POLY], arr, affine=AFF, nodata=-9999.0, spark=sp)
    assert len(out) == 1
    assert set(out[0]) == {"count", "min", "max", "mean"}
    # 8x8 centers minus none (nodata at (0,0) is outside the polygon)
    assert out[0]["count"] == 64
    assert isinstance(out[0]["mean"], float)


def test_input_source_equivalence(sp, arr):
    """WKT / WKB / GeoJSON dict / Feature / FC / iterable all agree
    (reference tests/test_io.py:54-188, test_zonal.py:406-415)."""
    import json

    base = api.zonal_stats([POLY], arr, affine=AFF, nodata=-9999.0, spark=sp)
    feat = {"type": "Feature", "properties": {}, "geometry": POLY}
    fc = {"type": "FeatureCollection", "features": [feat]}
    sources = [
        G.wkt_dumps(POLY),
        G.wkb_dumps(POLY),
        POLY,
        feat,
        fc,
        json.dumps(fc),
        [POLY],
    ]
    for src in sources:
        got = api.zonal_stats(src, arr, affine=AFF, nodata=-9999.0, spark=sp)
        assert got == base, src


def test_all_stats_and_percentiles(sp, arr):
    out = api.zonal_stats(
        [POLY], arr, affine=AFF, nodata=-9999.0, stats="*", spark=sp
    )[0]
    for s in api.VALID_STATS:
        assert s in out
    out2 = api.zonal_stats(
        [POLY], arr, affine=AFF, nodata=-9999.0,
        stats=["median", "percentile_50"], spark=sp,
    )[0]
    assert out2["median"] == out2["percentile_50"]
    with pytest.raises(ValueError):
        api.zonal_stats([POLY], arr, affine=AFF, stats=["percentile_101"], spark=sp)


def test_categorical_map(sp):
    cat = np.array([[1.0, 1.0, 2.0], [2.0, 2.0, 5.0], [5.0, 5.0, 5.0]], dtype=np.float32)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 3.0)
    poly = G.box(0, 0, 3, 3)
    out = api.zonal_stats([poly], cat, affine=aff, nodata=-1.0,
                          categorical=True, spark=sp)[0]
    assert out == {1.0: 2, 2.0: 3, 5.0: 4}
    out = api.zonal_stats(
        [poly], cat, affine=aff, nodata=-1.0, categorical=True,
        category_map={5.0: "five"}, spark=sp,
    )[0]
    assert out == {1.0: 2, 2.0: 3, "five": 4}


def test_add_stats_arity(sp, arr):
    """1/2/3-arg user aggregation dispatch (reference main.py:304-316,
    test_zonal.py:289-323)."""
    feat = {"type": "Feature", "properties": {"id": 3}, "geometry": POLY}

    def mymean(masked):
        return float(np.ma.mean(masked))

    def scaled(masked, props):
        return float(props["id"]) * float(np.ma.mean(masked))

    def covered(masked, props, rv):
        return float(rv.sum())

    out = api.zonal_stats(
        [feat], arr, affine=AFF, nodata=-9999.0,
        add_stats={"mymean": mymean, "scaled": scaled, "covered": covered},
        spark=sp,
    )[0]
    # user fn sees the NATIVE float32 masked array (reference main.py:208)
    # so np.ma.mean accumulates in float32; builtin mean merges in float64
    assert out["mymean"] == pytest.approx(out["mean"], rel=1e-6)
    assert out["scaled"] == pytest.approx(3 * out["mean"], rel=1e-6)
    assert out["covered"] == 64.0


def test_zone_func_modes(sp, arr):
    base = api.zonal_stats([POLY], arr, affine=AFF, nodata=-9999.0, spark=sp)[0]
    for mode in ("elementwise", "gather"):
        out = api.zonal_stats(
            [POLY], arr, affine=AFF, nodata=-9999.0,
            zone_func=lambda m: m + 2.0, zone_func_mode=mode, spark=sp,
        )[0]
        assert out["mean"] == pytest.approx(base["mean"] + 2.0, rel=1e-9)
    with pytest.raises(Exception):
        api.zonal_stats([POLY], arr, affine=AFF, nodata=-9999.0,
                        zone_func="nope", zone_func_mode="gather", spark=sp)


def test_raster_out_roundtrip(sp, arr):
    """Mini-raster stats equal first-pass stats (reference
    test_zonal.py:326-337)."""
    out = api.zonal_stats(
        [POLY], arr, affine=AFF, nodata=-9999.0, raster_out=True, spark=sp
    )[0]
    mini = out["mini_raster_array"]
    assert isinstance(mini, np.ma.MaskedArray)
    again = api.zonal_stats(
        [POLY],
        mini.data,
        affine=out["mini_raster_affine"],
        nodata=out["mini_raster_nodata"],
        spark=sp,
    )[0]
    assert again["count"] == out["count"]
    assert again["mean"] == pytest.approx(out["mean"], rel=1e-9)


def test_geojson_out_and_prefix(sp, arr):
    feat = {"type": "Feature", "properties": {"name": "z"}, "geometry": POLY}
    out = api.zonal_stats(
        [feat], arr, affine=AFF, nodata=-9999.0,
        geojson_out=True, prefix="zs_", spark=sp,
    )[0]
    assert out["type"] == "Feature"
    assert out["properties"]["name"] == "z"
    assert "zs_count" in out["properties"]
    assert "count" not in out["properties"]


def test_deprecated_surfaces(sp, arr):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = api.raster_stats([POLY], arr, affine=AFF, nodata=-9999.0, spark=sp)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert out[0]["count"] == 64
    # GDAL-style transform kwarg (reference main.py:160-168):
    # Affine.from_gdal(c, a, b, f, d, e)
    gdal_t = (AFF[2], AFF[0], AFF[1], AFF[5], AFF[3], AFF[4])
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        out2 = api.zonal_stats([POLY], arr, transform=gdal_t, nodata=-9999.0, spark=sp)
    assert out2 == out
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        out3 = api.zonal_stats(
            [POLY], arr, affine=AFF, nodata=-9999.0, band_num=1,
            copy_properties=True, global_src_extent=True, spark=sp,
        )
    assert out3 == out


def test_nodata_warning(sp, arr):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        api.zonal_stats([POLY], arr, affine=AFF, spark=sp)
        assert any(issubclass(x.category, api.NodataWarning) for x in w)


def test_stats_to_csv(sp, arr):
    out = api.zonal_stats([POLY, POLY], arr, affine=AFF, nodata=-9999.0, spark=sp)
    csv_text = api.stats_to_csv(out)
    lines = csv_text.strip().split("\r\n")
    assert lines[0] == "count,max,mean,min"
    assert len(lines) == 3


def test_json_serializable(sp, arr):
    """Everything except mini-rasters JSON-serializes
    (reference test_zonal.py:394-403)."""
    import json

    out = api.zonal_stats(
        [POLY], arr, affine=AFF, nodata=-9999.0, stats="*",
        categorical=True, spark=sp,
    )
    json.dumps(out)


def test_point_query_api(sp, arr):
    pt = {"type": "Point", "coordinates": [3.5, 6.5]}  # center of cell (3,3)
    out = api.point_query([pt], arr, affine=AFF, nodata=-9999.0, spark=sp)
    assert out[0] == pytest.approx(float(arr[3, 3]), rel=1e-9)
    line = {"type": "LineString", "coordinates": [[3.5, 6.5], [4.5, 5.5]]}
    out = api.point_query([line], arr, affine=AFF, nodata=-9999.0, spark=sp)
    assert len(out[0]) == 2
    gj = api.point_query(
        [pt], arr, affine=AFF, nodata=-9999.0, geojson_out=True,
        property_name="elev", spark=sp,
    )[0]
    assert gj["properties"]["elev"] == pytest.approx(float(arr[3, 3]), rel=1e-9)
    with pytest.raises(ValueError):
        api.point_query([pt], arr, affine=AFF, interpolate="cubic", spark=sp)


def test_ndarray_vs_corpus_equivalence(sp, corpus):
    """ndarray path == corpus path on identical data (reference
    test_zonal.py:258-278 file-vs-ndarray equivalence analog)."""
    from python_rasterstats_spark.fixtures import build_arrays, build_zones

    arrays = build_arrays()
    slope, aff, nd, _ = arrays["slope"]
    zones = [z["geom"] for z in build_zones() if z["collection"] == "polygons"]
    nd_out = api.zonal_stats(zones, slope, affine=aff, nodata=nd, spark=sp)

    tiles, zdf, datasets = corpus
    tr = api.TileRaster(tiles, datasets, "slope")
    corpus_out = api.zonal_stats(zones, tr, spark=sp)
    assert [o["count"] for o in nd_out] == [o["count"] for o in corpus_out] == [75, 50]
    for a, b in zip(nd_out, corpus_out):
        assert a["mean"] == pytest.approx(b["mean"], rel=1e-9)
