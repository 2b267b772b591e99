"""Corpus table loaders + in-memory ingestion.

The canonical storage is parquet with the BASELINE.json ``input_hint``
schema (tiles) plus zones/datasets side tables (fixtures.py). At cluster
scale these would be Iceberg tables partitioned by (dataset, tile_col,
tile_row buckets); ``spark.read.parquet`` and ``spark.read.format("iceberg")``
are interchangeable here because the engine only relies on column pruning
and the tile-key equi-join (partition pruning comes free once the key is a
partition column).
"""

from __future__ import annotations

import math
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import codecs as C
from .. import geom as G
from .. import kernel as K


def load_corpus(spark: SparkSession, directory: str):
    """(tiles, zones, datasets) DataFrames from a corpus directory."""
    tiles = spark.read.parquet(os.path.join(directory, "tiles.parquet"))
    zones = spark.read.parquet(os.path.join(directory, "zones.parquet"))
    datasets = spark.read.parquet(os.path.join(directory, "datasets.parquet"))
    return tiles, zones, datasets


def raster_to_rows(
    array: np.ndarray,
    affine,
    *,
    dataset: str = "mem",
    nodata: float | None = None,
    fmt: str = "npy",
    tile: int = 256,
):
    """Tile an in-memory ndarray into corpus-schema rows (S6 ndarray path,
    reference io.py:268-274). Returns (tile_rows, dataset_row)."""
    h, w = array.shape
    rows = []
    for tr in range(math.ceil(h / tile)):
        for tc in range(math.ceil(w / tile)):
            block = array[tr * tile : (tr + 1) * tile, tc * tile : (tc + 1) * tile]
            payload = C.encode_tile(block, fmt)
            image_id = f"{dataset}/{tc}_{tr}"
            taff = K.window_affine(
                ((tr * tile, tr * tile + block.shape[0]),
                 (tc * tile, tc * tile + block.shape[1])),
                affine,
            )
            rows.append(
                {
                    "image_id": image_id,
                    "bytes": payload,
                    "w": block.shape[1],
                    "h": block.shape[0],
                    "fmt": fmt,
                    "caption": f"tile {image_id} of {dataset}",
                    "phash": C.phash64(block),
                    "dataset": dataset,
                    "tile_col": tc,
                    "tile_row": tr,
                    "affine": [float(v) for v in affine],
                    "nodata": None if nodata is None else float(nodata),
                    "dtype": str(array.dtype),
                    "band_count": 1,
                }
            )
    ds_row = {
        "dataset": dataset,
        "affine": [float(v) for v in affine],
        "height": h,
        "width": w,
        "tile_w": tile,
        "tile_h": tile,
        "nodata": None if nodata is None else float(nodata),
        "dtype": str(array.dtype),
        "fmt": fmt,
        "band_count": 1,
    }
    return rows, ds_row


TILES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, dataset string, tile_col int, tile_row int, "
    "affine array<double>, nodata double, dtype string, band_count int"
)
DATASETS_DDL = (
    "dataset string, affine array<double>, height int, width int, tile_w int, "
    "tile_h int, nodata double, dtype string, fmt string, band_count int"
)
ZONES_DDL = (
    "zone_id long, collection string, geometry_wkb binary, geom_type string, "
    "properties map<string,string>"
)


def raster_to_tables(
    spark: SparkSession, array: np.ndarray, affine, **kw
) -> tuple[DataFrame, DataFrame]:
    """In-memory ndarray → (tiles, datasets) DataFrames."""
    rows, ds_row = raster_to_rows(array, affine, **kw)
    tiles = spark.createDataFrame(rows, schema=TILES_DDL)
    datasets = spark.createDataFrame([ds_row], schema=DATASETS_DDL)
    return tiles, datasets


def with_quadkey(
    tiles: DataFrame,
    *,
    level: int = 16,
    col: str = "tile_col",
    row: str = "tile_row",
    out: str = "quadkey",
) -> DataFrame:
    """Morton-interleaved quadkey column for the tile grid (JVM bit
    expressions; bit-identical to kernel.quadkey). Parents are bit
    prefixes (``qk >> 2``), so quadkey ranges align with spatial locality
    — the Iceberg partition/sort-transform candidate for the tile key at
    10^12 rows (a zone's cover cells become O(few) contiguous quadkey
    ranges instead of a scatter of (col, row) points). The default
    level 16 addresses grids up to 65,536 tiles per dim (≈4.3B tiles per
    dataset); a wider grid wraps the code (high bits dropped) — sorting
    stays deterministic and the pruning predicate detects the overflow
    and falls back to an unpruned scan for that dataset
    (operators/zonal.quadkey_prune_ranges), so results are never wrong,
    only unpruned. Raise ``level`` (≤31) for wider grids."""
    qk = None
    for k in range(level):
        cbit = F.shiftleft(
            F.shiftright(F.col(col), k).bitwiseAND(F.lit(1)).cast("long"),
            2 * k,
        )
        rbit = F.shiftleft(
            F.shiftright(F.col(row), k).bitwiseAND(F.lit(1)).cast("long"),
            2 * k + 1,
        )
        term = cbit.bitwiseOR(rbit)
        qk = term if qk is None else qk.bitwiseOR(term)
    return tiles.withColumn(out, qk)


def write_quadkey_sorted_tiles(
    tiles: DataFrame,
    path: str,
    *,
    level: int = 16,
    files: int | None = None,
    row_group_bytes: int = 8 << 20,
) -> None:
    """Persist the tile table range-partitioned + sorted by (dataset,
    quadkey) — the storage layout that makes PER-ZONE scan pruning
    (operators/zonal.quadkey_prune_ranges) effective: each zone's ≤64
    1-D quadkey ranges map to contiguous runs of row groups/files, so a
    sparse zone set over a planet-sized corpus reads only its working
    set. On a real warehouse this is Iceberg's sort-order/partition
    transform on the Morton key; plain parquet gets the same row-group
    min-max skipping from the sort alone.

    ``row_group_bytes`` caps the parquet row-group size (default 8 MiB vs
    parquet's 128 MiB default): the row group is the min-max skipping
    granule, so with payload-bearing tile rows the default would make
    every admitted group drag ~128 MiB of neighbors along — the r4 audit
    measured 36 MiB/group costing 2.25× the bytes the per-zone rect
    predicate reads; 8 MiB groups put sorted storage BELOW it (BENCH.md
    sparse-zone table). The reference analog is the per-feature windowed
    read (io.py:292-362): read the window, not the strip it lives in."""
    n = files or tiles.sparkSession.sparkContext.defaultParallelism
    (
        with_quadkey(tiles, level=level)
        .repartitionByRange(n, "dataset", "quadkey")
        .sortWithinPartitions("dataset", "quadkey")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        # parquet-mr checks accumulated size only every ≥100 records by
        # default — at ~256 KiB/tile row that floors groups at ~25 MiB
        # regardless of block.size; check every few rows instead
        .option("parquet.page.size.row.check.min", "4")
        .option("parquet.page.size.row.check.max", "64")
        .parquet(path)
    )


def quad_prefix_shift(ntc: int, ntr: int, target_partitions: int = 64) -> int:
    """Bit shift turning a quadkey into its quad-prefix partition value
    for a dataset whose grid is ``ntc × ntr`` tiles: the populated code
    space spans ``2*levels`` bits (levels = ceil(log2(max dim))), and the
    top ~log2(target_partitions) bits become the prefix — ≤64 directories
    whatever the grid size. Writer and pruning predicate MUST derive the
    shift from the same datasets metadata (this function) so partition
    values always agree."""
    dim = max(ntc, ntr, 1)
    levels = max(1, math.ceil(math.log2(dim)))
    bits = max(1, round(math.log2(max(target_partitions, 2))))
    return max(0, 2 * levels - bits)


def dataset_prefix_shifts(meta: dict) -> dict:
    """Per-dataset quad-prefix shift from the datasets metadata dict."""
    out = {}
    for ds, m in meta.items():
        ntc = math.ceil(m["width"] / m["tile_w"])
        ntr = math.ceil(m["height"] / m["tile_h"])
        out[ds] = quad_prefix_shift(ntc, ntr)
    return out


def write_quadkey_partitioned_tiles(
    tiles: DataFrame,
    datasets: DataFrame,
    path: str,
    *,
    level: int = 16,
    row_group_bytes: int = 8 << 20,
) -> None:
    """Persist the tile table PARTITIONED by the quad-prefix of its
    quadkey (``qk_prefix = quadkey >> shift(dataset)``, ≤64 directories
    per dataset; shift derived from the dataset's grid dims so both this
    writer and the pruning predicate agree) and sorted by quadkey within
    partitions — Iceberg's partition-transform idea on plain parquet. A
    zone's quadkey ranges then prune at THREE levels: directory listing
    (Spark partition pruning on qk_prefix — PartitionFilters in the
    scan), row-group skipping (quadkey min-max stats), and the residual
    row filter. The pruning predicate picks the prefix IN-list up
    automatically when the scan has a qk_prefix column
    (operators/zonal.tile_prune_filter)."""
    from ..operators.zonal import collect_dataset_meta

    shifts = dataset_prefix_shifts(collect_dataset_meta(datasets))
    qk = with_quadkey(tiles, level=level)

    def _q(s: str) -> str:  # same escaping as the pruning predicates
        return "'" + s.replace("'", "''") + "'"

    cases = " ".join(
        f"WHEN dataset = {_q(ds)} THEN shiftright(quadkey, {sh})"
        for ds, sh in shifts.items()
    )
    (
        qk.withColumn(
            "qk_prefix", F.expr(f"CASE {cases} ELSE quadkey END")
        )
        .repartition("qk_prefix")
        .sortWithinPartitions("qk_prefix", "quadkey")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        .option("parquet.page.size.row.check.min", "4")
        .option("parquet.page.size.row.check.max", "64")
        .partitionBy("qk_prefix")
        .parquet(path)
    )


def write_bucketed_tiles(
    tiles: DataFrame, table_name: str, *, buckets: int = 32
) -> None:
    """Persist the tile table bucketed+sorted by the join key.

    With both join sides bucketed on (dataset, tile_col, tile_row), the
    zone-cell ⋈ tiles join needs no tile-side Exchange even in the
    sort-merge regime — the storage-layout answer for zone sets too large
    to broadcast (SURVEY.md §4 join-strategy row; Iceberg's bucket
    partition transform plays this role on a real warehouse)."""
    (
        tiles.write.mode("overwrite")
        .bucketBy(buckets, "dataset", "tile_col", "tile_row")
        .sortBy("dataset", "tile_col", "tile_row")
        .format("parquet")
        .saveAsTable(table_name)
    )


def features_to_zones(
    spark: SparkSession, vectors, layer: int = 0, dataset: str | None = None
) -> DataFrame:
    """read_features-equivalent ingestion → zones DataFrame (S1/S3/S4).

    Accepts everything geom.read_features does (WKT/WKB/GeoJSON/mapping/
    __geo_interface__/iterable — reference io.py:92-139); zone_id preserves
    input order.
    """
    feats = list(G.read_features(vectors, layer))
    rows = []
    for i, f in enumerate(feats):
        g = f["geometry"]
        props = {str(k): str(v) for k, v in (f.get("properties") or {}).items()}
        rows.append(
            {
                "zone_id": i,
                "collection": "user",
                "geometry_wkb": G.wkb_dumps(g),
                "geom_type": g["type"],
                "properties": props,
            }
        )
    df = spark.createDataFrame(rows, schema=ZONES_DDL)
    if dataset is not None:
        df = df.withColumn("dataset", F.lit(dataset))
    return df
