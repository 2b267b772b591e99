"""Tests: session_window batch/stream equivalence; Raster handle parity."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from python_rasterstats_spark.streaming.sessions import (
        sessionize, sessionize_stream,
    )

    stream_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(stream_dir)
    shutil.copy(f"{SF}/events.parquet", stream_dir)
    q = sessionize_stream(
        spark, stream_dir, out_dir, str(tmp_path / "ckpt"), gap="30 minutes"
    )
    q.awaitTermination(120)

    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["user_id"], r["first_ts"]): (r["n_events"], r["sum_value"])
        for r in sessionize(events, gap="30 minutes").collect()
    }
    streamed = {
        (r["user_id"], r["first_ts"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed
    for key, val in streamed.items():
        assert batch[key] == val
    # only the last (open) session per user may be withheld by the watermark
    n_users = events.select("user_id").distinct().count()
    assert len(streamed) >= len(batch) - n_users


def test_raster_handle_ndarray():
    from python_rasterstats_spark.sources.raster import Raster

    arr = np.arange(100.0).reshape(10, 10).astype(np.float32)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 10.0)
    with Raster(arr, affine=aff, nodata=-1.0) as r:
        assert r.index(2.5, 7.5) == (2, 2)
        sub = r.read(bounds=(2.0, 5.0, 5.0, 8.0))
        assert sub.array.shape == (3, 3)
        assert sub.array[0, 0] == arr[2, 2]
        assert sub.affine == (1.0, 0.0, 2.0, 0.0, -1.0, 8.0)
        # boundless pad
        pad = r.read(window=((-2, 2), (-2, 2)))
        assert (pad.array[:2, :2] == -1.0).all()
        with pytest.raises(ValueError):
            r.read(window=((-2, 2), (-2, 2)), boundless=False)
        with pytest.raises(ValueError):
            r.read(bounds=(0, 0, 1, 1), window=((0, 1), (0, 1)))
        masked = r.read(window=((-1, 1), (0, 2)), masked=True)
        assert masked.array.mask[0].all()


def test_raster_handle_corpus(corpus):
    from python_rasterstats_spark.fixtures import build_arrays
    from python_rasterstats_spark.sources.raster import Raster

    tiles, _, datasets = corpus
    slope, aff, nd, _ = build_arrays()["slope"]
    r = Raster.from_corpus(tiles, datasets, "slope")
    assert r.shape == slope.shape
    # window read straddling tile seams equals the source array
    sub = r.read(window=((20, 50), (25, 70)))
    assert np.allclose(sub.array, slope[20:50, 25:70].astype(np.float64))
    # boundless beyond the grid pads with nodata
    sub = r.read(window=((-3, 3), (-3, 3)))
    assert (sub.array[:3, :3] == nd).all()
    with pytest.raises(ValueError):
        Raster.from_corpus(tiles, datasets, "nope")