"""Optional rasterio/fiona ingestion (reference io.py:94-109, 276-285).

The engine core is zero-GDAL; file paths work only when the optional
packages are installed (not in this container — the parity tests are
skipif-gated and the error-path tests always run)."""

import importlib.util

import numpy as np
import pytest

from python_rasterstats_spark import api
from python_rasterstats_spark import geom as G

HAS_RASTERIO = importlib.util.find_spec("rasterio") is not None
HAS_FIONA = importlib.util.find_spec("fiona") is not None


def test_raster_path_without_rasterio_raises(sp_or_none=None):
    if HAS_RASTERIO:
        pytest.skip("rasterio installed")
    with pytest.raises(ValueError, match="optional 'rasterio' package"):
        api._resolve_raster(None, "/etc/hostname", None, None, 1)


def test_vector_path_without_fiona_raises():
    if HAS_FIONA:
        pytest.skip("fiona installed")
    with pytest.raises(ValueError, match="optional 'fiona' package"):
        G.read_features("/etc/hostname")


def test_nonexistent_path_still_parses_as_wkt():
    feats = list(G.read_features("POINT (1 2)"))
    assert feats[0]["geometry"]["type"] == "Point"


@pytest.mark.skipif(not HAS_RASTERIO, reason="rasterio not installed")
def test_raster_path_parity(spark, tmp_path):
    import rasterio
    from rasterio.transform import Affine

    arr = np.arange(100, dtype=np.float32).reshape(10, 10)
    path = str(tmp_path / "r.tif")
    with rasterio.open(
        path, "w", driver="GTiff", width=10, height=10, count=1,
        dtype="float32", nodata=-9.0,
        transform=Affine(1.0, 0.0, 0.0, 0.0, -1.0, 10.0),
    ) as dst:
        dst.write(arr, 1)
    got = api.zonal_stats([G.box(2.2, 2.2, 7.8, 7.8)], path, spark=spark)
    want = api.zonal_stats(
        [G.box(2.2, 2.2, 7.8, 7.8)], arr,
        affine=(1.0, 0.0, 0.0, 0.0, -1.0, 10.0), nodata=-9.0, spark=spark,
    )
    assert got == want


@pytest.mark.skipif(not HAS_FIONA, reason="fiona not installed")
def test_vector_path_parity(spark, tmp_path):
    import json

    import fiona

    feat = {"type": "Feature", "properties": {},
            "geometry": G.box(1.0, 1.0, 5.0, 5.0)}
    path = str(tmp_path / "v.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": [feat]}, f)
    got = list(G.read_features(path))
    assert got[0]["geometry"]["type"] == "Polygon"
