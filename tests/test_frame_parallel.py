"""Frame-sequence ops must not serialize a dataset into one task
(r2 verdict #6): frame_sample / scene_cuts now derive the frame index
arithmetically from the dense row-major grid and take the lag via a
predecessor equi-join — no Window.partitionBy(dataset) anywhere."""

from pyspark.sql import Window, functions as F

from python_rasterstats_spark.functions.multimodal import (
    frame_sample, scene_cuts,
)


def _fixture_tiles(spark):
    from python_rasterstats_spark.fixtures import ensure_fixtures
    from python_rasterstats_spark.sources.tables import load_corpus
    import os

    fix = ensure_fixtures(os.path.join(os.path.dirname(__file__), "..",
                                       "data", "zonal_fixtures"))
    tiles, _, _ = load_corpus(spark, fix)
    return tiles.repartition(8)  # force multi-partition input


def _window_reference(tiles, threshold):
    w = Window.partitionBy("dataset").orderBy("tile_row", "tile_col")
    prev = F.lag("phash").over(w)
    ham = F.bit_count(F.col("phash").bitwiseXOR(prev))
    return (
        tiles.withColumn("frame_idx", F.row_number().over(w) - 1)
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") > threshold)
        .select("dataset", "frame_idx", "image_id", "hamming")
    )


def test_scene_cuts_matches_window_reference_without_window(spark):
    tiles = _fixture_tiles(spark)
    df = scene_cuts(tiles, threshold=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the serialization-free plan
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, _window_reference(tiles, 20).collect()))
    assert got == want and len(got) > 0


def test_frame_sample_matches_window_reference_without_window(spark):
    tiles = _fixture_tiles(spark)
    df = frame_sample(tiles, every=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    w = Window.partitionBy("dataset").orderBy("tile_row", "tile_col")
    ref = (
        tiles.withColumn("frame_idx", F.row_number().over(w) - 1)
        .filter(F.col("frame_idx") % 4 == 0)
        .select("dataset", "frame_idx", "image_id", "caption", "phash")
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, ref.collect()))
    assert got == want and len(got) > 0
