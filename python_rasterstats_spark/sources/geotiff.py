"""Distributed GeoTIFF corpus ingestion — files → the tile table schema.

The driver-side path (api._resolve_raster) decodes ONE file on the
driver; a 100-TB corpus is thousands-to-millions of scene FILES, and the
decode must happen where the bytes land. This module does that with
Spark's ``binaryFile`` source: each file's bytes ship straight to an
executor, tiffcodec decodes there, and the array is tiled into
input_hint-schema rows inside the same mapInPandas — no driver decode,
no py4j byte shipping, parallelism = file count.

One file = one dataset (named by its file stem), matching the
scene/granule shape of real imagery archives. Reference analog: the
per-path rasterio open (io.py:276-285) — done once per file, on the
cluster.

Production flow at scale: ``geotiffs_to_tables`` → write the tiles
DataFrame to parquet (one decode pass), then derive the small datasets
dim from the WRITTEN tiles with ``datasets_from_tiles`` (column-pruned
scan, no payload read, no second decode). The convenience return here
computes datasets from the live plan, which re-decodes unless the
caller persists — fine at test scale, documented for real use.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import codecs as C
from .. import kernel as K
from ..tiffcodec import read_geotiff

# tiles schema + the per-dataset fields needed to build the datasets dim
# without a second decode
_EXT_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, dataset string, tile_col int, tile_row int, "
    "affine array<double>, nodata double, dtype string, band_count int, "
    "ds_affine array<double>, ds_height int, ds_width int, "
    "tile_w int, tile_h int"
)


def _tile_file(name: str, arr: np.ndarray, aff, nodata, tile: int, fmt: str):
    nbands = arr.shape[0] if arr.ndim == 3 else 1
    h, w = arr.shape[-2:]
    for tr in range(-(-h // tile)):
        for tc in range(-(-w // tile)):
            block = arr[..., tr * tile: (tr + 1) * tile,
                        tc * tile: (tc + 1) * tile]
            payload = C.encode_tile(block, fmt)
            taff = K.window_affine(
                ((tr * tile, tr * tile + block.shape[-2]),
                 (tc * tile, tc * tile + block.shape[-1])),
                aff,
            )
            yield {
                "image_id": f"{name}/{tc}_{tr}",
                "bytes": payload,
                "w": block.shape[-1],
                "h": block.shape[-2],
                "fmt": fmt,
                "caption": f"tile {name}/{tc}_{tr} of {name}",
                "phash": C.phash64(block[0] if block.ndim == 3 else block),
                "dataset": name,
                "tile_col": tc,
                "tile_row": tr,
                "affine": [float(v) for v in taff],
                "nodata": None if nodata is None else float(nodata),
                "dtype": str(arr.dtype),
                "band_count": nbands,
                "ds_affine": [float(v) for v in aff],
                "ds_height": h,
                "ds_width": w,
                "tile_w": tile,
                "tile_h": tile,
            }


def geotiff_tiles(
    spark: SparkSession,
    src: str,
    *,
    tile: int = 256,
    fmt: str = "npy",
    pattern: str = "*.tif*",
) -> DataFrame:
    """binaryFile scan of ``src`` (dir/glob) → extended tile rows, decoded
    and tiled ON THE EXECUTORS (schema = tiles + ds_* dataset fields)."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(src)
        .select("path", "content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.splitext(os.path.basename(str(path)))[0]
                arr, aff, nodata = read_geotiff(bytes(content))
                if aff is None:
                    raise ValueError(
                        f"{path}: GeoTIFF carries no georeferencing keys"
                    )
                rows.extend(_tile_file(name, arr, aff, nodata, tile, fmt))
            if rows:
                yield pd.DataFrame(rows)

    return bin_df.mapInPandas(gen, _EXT_DDL)


def datasets_from_tiles(tiles_ext: DataFrame) -> DataFrame:
    """The small datasets dim aggregated from (written or live) extended
    tile rows — a column-pruned scan that never touches payload bytes."""
    return (
        tiles_ext.groupBy("dataset")
        .agg(
            F.first("ds_affine").alias("affine"),
            F.first("ds_height").alias("height"),
            F.first("ds_width").alias("width"),
            F.first("tile_w").alias("tile_w"),
            F.first("tile_h").alias("tile_h"),
            F.first("nodata").alias("nodata"),
            F.first("dtype").alias("dtype"),
            F.first("fmt").alias("fmt"),
            F.first("band_count").alias("band_count"),
        )
    )


def geotiffs_to_tables(
    spark: SparkSession,
    src: str,
    *,
    tile: int = 256,
    fmt: str = "npy",
    pattern: str = "*.tif*",
) -> tuple[DataFrame, DataFrame]:
    """(tiles, datasets) from a directory/glob of GeoTIFF files.

    Convenience form: ``datasets`` aggregates from the live decode plan
    (re-decodes unless persisted). At corpus scale, write the tiles first
    and run datasets_from_tiles over the parquet instead (module
    docstring)."""
    ext = geotiff_tiles(spark, src, tile=tile, fmt=fmt, pattern=pattern)
    datasets = datasets_from_tiles(ext)
    tiles = ext.drop("ds_affine", "ds_height", "ds_width", "tile_w", "tile_h")
    return tiles, datasets
