"""Gather-tier zonal evaluation — per-zone mosaic for non-decomposable ops.

``add_stats`` user functions (reference main.py:304-316), ``raster_out``
mini-rasters (main.py:318-321) and non-elementwise ``zone_func`` transforms
cannot be split into mergeable partials: they need the whole masked zone
array. This operator gathers each zone's covering tiles into one task,
mosaics the bbox window, and runs the exact single-zone kernel there.

Memory per task is bounded by the zone's bbox window (``max_zone_pixels``
guard) — this is the documented non-scalable tier; the partial/merge
protocol in operators/zonal.py is the scale path (SURVEY.md §2.4 A18).
"""

from __future__ import annotations

import inspect
import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import codecs as C
from .. import geom as G
from .. import kernel as K
from .zonal import collect_dataset_meta, tile_prune_filter, zone_cover_cells

_MINI_RASTER_TYPE = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mask", T.BinaryType()),
        T.StructField("affine", T.ArrayType(T.DoubleType())),
        T.StructField("nodata", T.DoubleType()),
    ]
)


def _result_schema(stats, categorical, add_stats, raster_out) -> T.StructType:
    fields = [T.StructField("zone_id", T.LongType())]
    for s in stats:
        if s in ("count", "unique"):
            fields.append(T.StructField(s, T.LongType()))
        else:
            fields.append(T.StructField(s, T.DoubleType()))
    if categorical:
        fields.append(
            T.StructField("value_counts", T.MapType(T.DoubleType(), T.LongType()))
        )
    for name in add_stats or {}:
        fields.append(T.StructField(name, T.DoubleType()))
    if raster_out:
        fields.append(T.StructField("mini_raster", _MINI_RASTER_TYPE))
    return T.StructType(fields)


def zonal_gather_df(
    zones: DataFrame,
    tiles: DataFrame,
    datasets: DataFrame,
    *,
    dataset: str | None = None,
    stats=None,
    all_touched: bool = False,
    categorical: bool = False,
    nodata: float | None = None,
    boundless: bool = True,
    zone_func=None,
    add_stats: dict | None = None,
    raster_out: bool = False,
    band: int = 1,
    max_zone_pixels: int = 64_000_000,
    max_cells_per_zone: int = 4_000_000,
) -> DataFrame:
    """Zonal stats with per-zone gather semantics (the reference's exact
    execution model, distributed across zones instead of pixels)."""
    stats, _ = K.check_stats(stats, categorical)
    meta = collect_dataset_meta(datasets)
    if dataset is not None:
        if dataset not in meta:
            raise ValueError(f"dataset {dataset!r} not in datasets table")
        zones = zones.withColumn("dataset", F.lit(dataset))
    if "properties_json" not in zones.columns:
        zones = zones.withColumn("properties_json", F.lit(None).cast("string"))

    zcols = zones.select("zone_id", "dataset", "geometry_wkb", "properties_json")
    # KEY-ONLY cells: geometry + properties ship once per zone via a
    # broadcast dict (same rationale as operators/zonal.py — never store
    # WKB per covering tile). The gather tier is broadcast-regime by
    # definition (each zone must fit one task anyway).
    cells = zone_cover_cells(
        zcols, meta, clip_to_grid=False, max_cells_per_zone=max_cells_per_zone,
        raise_beyond_extent=not boundless,
    )
    zrows = zcols.collect()
    zinfo = {
        row["zone_id"]: (bytes(row["geometry_wkb"]), row["properties_json"])
        for row in zrows
    }
    zbc = zones.sparkSession.sparkContext.broadcast(zinfo)
    # scan-level tile pruning from the already-collected zone dim
    pred = tile_prune_filter(
        {(r["zone_id"], r["dataset"]): bytes(r["geometry_wkb"]) for r in zrows},
        meta,
    )
    if pred is not None:
        tiles = tiles.filter(pred)
    # Inner broadcast join (a left join cannot broadcast its left side and
    # would shuffle the tile table — same plan rule as operators/zonal.py).
    # Zones whose tiles are ALL absent must still produce a count-0 row
    # (reference main.py:230-234), and missing cells inside a partly
    # covered zone need no row at all (the mosaic canvas is pre-filled), so
    # it suffices to reinstate one NULL-payload stub row per zone that the
    # inner join dropped entirely.
    keys = ["dataset", "tile_col", "tile_row"]
    tile_side = tiles.select(*keys, "bytes", "fmt")
    present = F.broadcast(cells).join(tile_side, keys, "inner")
    present_zones = F.broadcast(cells).join(
        tiles.select(*keys), keys, "inner"
    ).select("zone_id")
    stubs = (
        cells.join(F.broadcast(present_zones), "zone_id", "left_anti")
        .dropDuplicates(["zone_id"])
        .withColumn("bytes", F.lit(None).cast("binary"))
        .withColumn("fmt", F.lit(None).cast("string"))
    )
    joined = present.unionByName(stubs)

    schema = _result_schema(stats, categorical, add_stats, raster_out)
    add_stats = add_stats or {}

    def per_zone(pdf: pd.DataFrame) -> pd.DataFrame:
        zid = int(pdf["zone_id"].iloc[0])
        ds = pdf["dataset"].iloc[0]
        m = meta[ds]
        aff = m["affine"]
        wkb, props_json = zbc.value[zid]
        geom = G.wkb_loads(wkb)
        geom_eff = (
            K.boxify_points(geom, aff) if "Point" in geom["type"] else geom
        )
        win = K.bounds_window(G.geom_bounds(geom_eff), aff)
        (r0, r1), (c0, c1) = win
        if (r1 - r0) * (c1 - c0) > max_zone_pixels:
            raise ValueError(
                f"zone {zid}: window {(r1 - r0)}×{(c1 - c0)} exceeds "
                f"max_zone_pixels={max_zone_pixels} — use the partial/merge "
                "operator (zonal_stats_df) for zones this large"
            )
        nd = nodata if nodata is not None else m["nodata"]
        fill = -999.0 if nd is None else nd
        # mosaic in the raster's NATIVE dtype: the reference hands zone_func/
        # add_stats the raw-band masked array (main.py:208-228), so e.g.
        # float32 rounding in user transforms must match bit-for-bit.
        # Native only when the fill round-trips (kernel.fill_dtype) — an
        # unrepresentable fill (uint8 raster, nodata None → -999) would
        # wrap into the data range and corrupt boundless/missing pixels.
        cdtype = np.dtype(m["dtype"]) if m.get("dtype") else np.float64
        canvas = np.full((r1 - r0, c1 - c0), fill, dtype=K.fill_dtype(cdtype, fill))
        for tc, tr, payload, fmt in zip(
            pdf["tile_col"], pdf["tile_row"], pdf["bytes"], pdf["fmt"]
        ):
            if payload is None:
                continue
            block = np.asarray(C.decode_tile(bytes(payload), fmt))
            if block.ndim == 3:  # band select (S6, io.py:279)
                block = block[band - 1]
            rr0 = max(r0, tr * m["tile_h"])
            rr1 = min(r1, tr * m["tile_h"] + block.shape[0])
            cc0 = max(c0, tc * m["tile_w"])
            cc1 = min(c1, tc * m["tile_w"] + block.shape[1])
            if rr0 >= rr1 or cc0 >= cc1:
                continue
            canvas[rr0 - r0 : rr1 - r0, cc0 - c0 : cc1 - c0] = block[
                rr0 - tr * m["tile_h"] : rr1 - tr * m["tile_h"],
                cc0 - tc * m["tile_w"] : cc1 - tc * m["tile_w"],
            ]

        # reference per-feature body (main.py:194-321) on the mosaic
        pgeom = K.geom_to_pixel(geom_eff, aff)
        rv = K.rasterize_pixgeom(pgeom, win, all_touched=all_touched)
        isnan = np.isnan(canvas)
        isnodata = (canvas == fill) | isnan
        masked = np.ma.MaskedArray(canvas, mask=(isnodata | ~rv))
        if zone_func is not None:
            if not callable(zone_func):
                raise TypeError(
                    "zone_func must be a callable function "
                    "which accepts a single `zone_array` arg."
                )
            ret = zone_func(masked)
            if ret is not None:
                masked = ret
        data = np.ma.filled(masked.astype(np.float64), np.nan)
        cover = ~np.ma.getmaskarray(masked)
        part = K.partial_stats(data, cover, None, True)
        part["nodata_count"] = int(((canvas == fill) & rv).sum())
        part["nan_count"] = int((isnan & rv).sum())
        out = K.finalize_stats(part, stats, categorical=False)

        row: dict = {"zone_id": [zid]}
        for s in stats:
            v = out.get(s)
            row[s] = [None if v is None else (int(v) if s in ("count", "unique") else float(v))]
        if categorical:
            vc = dict(zip(part["vc_vals"].tolist(), part["vc_cnts"].tolist()))
            row["value_counts"] = [
                {float(k): int(v) for k, v in vc.items()} if vc else None
            ]
        if add_stats:
            props = json.loads(props_json) if props_json else {}
            for name, fn in add_stats.items():
                n_params = len(inspect.signature(fn).parameters)
                if n_params == 3:  # main.py:306-316 arity dispatch
                    v = fn(masked, props, rv)
                elif n_params == 2:
                    v = fn(masked, props)
                else:
                    v = fn(masked)
                row[name] = [None if v is None else float(v)]
        if raster_out:
            row["mini_raster"] = [
                {
                    "data": C.encode_tile(
                        np.ma.filled(masked, fill).astype(np.float32), "npy"
                    ),
                    "mask": C.encode_tile(np.ma.getmaskarray(masked), "npy"),
                    "affine": list(K.window_affine(win, aff)),
                    "nodata": float(fill),
                }
            ]
        return pd.DataFrame(row)

    return joined.groupBy("zone_id").applyInPandas(per_zone, schema)
