"""Distributed zonal statistics — the engine's core operator.

Replaces the reference's per-feature Python loop (main.py:183-337) with a
Spark plan:

    zones ──mapInPandas──▶ zone_cells (zone_id, dataset, tile_col, tile_row)
                                   │  inner equi-join on tile key,
    tiles ─────────────────────────┤  zone side broadcast (or SMJ)    [J1]
                                   │  + key-only anti join synthesizes
                                   ▼  missing-tile fill cells         [J4]
            mapInPandas partial kernel: decode payload, rasterize the
            zone onto the tile's sub-grid (global alignment → seam-safe),
            mask, emit mergeable partial structs                      [P2-P5]
                                   │
         scalar-only: groupBy(zone_id) JVM agg (whole-stage codegen,
         map-side combine)                                         [A1-A6]
         holistic: ONE groupBy(zone_id) applyInPandas merging scalars +
         (value, count) arrays together — exact median/percentiles/
         majority/minority/unique/value_counts; optional salted pre-merge
         and quantile-summary sketching for continuous rasters    [A7-A15]
                                   │
                                   ▼ broadcast join back to zones      [J2]
                     final projection w/ empty-zone semantics          [A17]

Scale properties:
- tiles are never shuffled in ANY path (incl. boundless nodata): the
  zone_cells side is broadcast (inner join) so the scan streams map-side;
  the only shuffle is the zone-keyed merge, whose payload is partial
  structs, with map-side combine (scalar path) or salted pre-merge
  (holistic path) bounding the reduce fan-in.
- skewed (continent-sized) zones fan out to one row per covering tile, so
  their partial work spreads across all executors; the salted pre-merge
  re-spreads the merge of hot zones (north_rule salting requirement).
- holistic stats are exact at parity scale: merged (value, count) pairs
  reproduce np.percentile's linear interpolation and np.unique-order
  tiebreaks (reference main.py:270-292, utils.py:117-122). Past
  ``auto_px_per_zone`` bbox pixels per zone the default
  ``holistic_mode='auto'`` switches plans with no knob: on continuous
  float rasters (exact domain degenerates to one pair per pixel) a
  deterministic uniform-rank quantile summary bounds the shuffle
  (kernel.sketch_weighted — count/min/max stay exact, quantile rank error
  ≤ n/(8×sketch_px)); when the exact domain is required, a salted
  two-stage exact merge spreads the hot zone instead. ``'exact'``/
  ``'sketch'`` force either plan.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import codecs as C
from .. import geom as G
from .. import kernel as K

# ---------------------------------------------------------------------------
# dataset metadata
# ---------------------------------------------------------------------------


def collect_dataset_meta(datasets: DataFrame) -> dict:
    """Materialize the (tiny) datasets dimension to a plain dict that is
    shipped to executors inside UDF closures."""
    meta = {}
    for row in datasets.collect():
        meta[row["dataset"]] = {
            "affine": tuple(row["affine"]),
            "height": int(row["height"]),
            "width": int(row["width"]),
            "tile_w": int(row["tile_w"]),
            "tile_h": int(row["tile_h"]),
            "nodata": None if row["nodata"] is None else float(row["nodata"]),
            "fmt": row["fmt"],
            "band_count": int(row.asDict().get("band_count") or 1),
            "dtype": row.asDict().get("dtype"),
        }
    return meta


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow table so the following Arrow stage
    parallelizes — zone tables often arrive as one parquet file → one
    task. SKIPPED when the input already has ≥ target partitions (r5
    verdict #6: at 10⁹ zones the unconditional round-robin was a
    gratuitous full shuffle of an already-spread table). The partition
    probe plans the RDD without executing it — tens of ms, cheap next to
    either outcome."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _effective_geom(wkb: bytes, aff):
    """Decode + point-boxify (reference main.py:186-187, utils.py:125-145)."""
    geom = G.wkb_loads(bytes(wkb))
    if "Point" in geom["type"]:
        geom = K.boxify_points(geom, aff)
    return geom


# ---------------------------------------------------------------------------
# stage 1 — cover cells
# ---------------------------------------------------------------------------

def _zone_tile_window(geom, m: dict, clip_to_grid: bool):
    """(tr0, tr1, tc0, tc1, ncells) of a zone's covering tile window —
    the ONE bbox→tile-window derivation shared by the cover-cell
    generator, the pruning predicates and the hybrid-WKB sizing pass, so
    their decisions can never diverge."""
    aff = m["affine"]
    (r0, r1), (c0, c1) = K.bounds_window(G.geom_bounds(geom), aff)
    tr0, tr1 = math.floor(r0 / m["tile_h"]), math.floor((r1 - 1) / m["tile_h"])
    tc0, tc1 = math.floor(c0 / m["tile_w"]), math.floor((c1 - 1) / m["tile_w"])
    if clip_to_grid:
        ntr = math.ceil(m["height"] / m["tile_h"])
        ntc = math.ceil(m["width"] / m["tile_w"])
        tr0, tr1 = max(tr0, 0), min(tr1, ntr - 1)
        tc0, tc1 = max(tc0, 0), min(tc1, ntc - 1)
    ncells = max(tr1 - tr0 + 1, 0) * max(tc1 - tc0 + 1, 0)
    return tr0, tr1, tc0, tc1, ncells


def _cells_schema(with_geometry: bool) -> T.StructType:
    fields = [
        T.StructField("zone_id", T.LongType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("tile_col", T.IntegerType()),
        T.StructField("tile_row", T.IntegerType()),
    ]
    if with_geometry:
        fields.append(T.StructField("geometry_wkb", T.BinaryType()))
    return T.StructType(fields)


def broadcast_zone_geoms(zones: DataFrame):
    """Broadcast the one-row-per-zone geometry dim as a plain dict keyed by
    (zone_id, dataset).

    The broadcast-regime answer to per-cell WKB duplication: a continent
    zone covering millions of tiles stores its (potentially multi-MB) WKB
    exactly ONCE per executor, instead of once per covering tile inside
    the broadcast relation and again per row through the kernel-stage
    Arrow stream. Collecting here costs the same driver memory a broadcast
    hash join of the zone dim would (the driver builds the broadcast
    relation either way)."""
    spark = zones.sparkSession
    d = {}
    for row in zones.select("zone_id", "dataset", "geometry_wkb").collect():
        d[(row["zone_id"], row["dataset"])] = bytes(row["geometry_wkb"])
    return spark.sparkContext.broadcast(d)


def _zone_tile_rects(geoms: dict, meta: dict, *, pad_tiles: int = 0) -> dict:
    """Per-ZONE clipped tile rectangles, grouped by dataset:
    ``{dataset: [(tc0, tc1, tr0, tr1), ...]}`` — the same bbox→tile-window
    math as zone_cover_cells (so every cover cell lies inside its zone's
    rect), padded by ``pad_tiles`` and clipped to the stored tile grid
    (tiles outside the grid don't exist, so clipping cannot lose a join
    partner)."""
    rects: dict = {}
    for (zid, ds), wkb in geoms.items():
        m = meta.get(ds)
        if m is None:
            continue
        aff = m["affine"]
        geom = _effective_geom(wkb, aff)
        (r0, r1), (c0, c1) = K.bounds_window(G.geom_bounds(geom), aff)
        tr0 = math.floor(r0 / m["tile_h"]) - pad_tiles
        tr1 = math.floor((r1 - 1) / m["tile_h"]) + pad_tiles
        tc0 = math.floor(c0 / m["tile_w"]) - pad_tiles
        tc1 = math.floor((c1 - 1) / m["tile_w"]) + pad_tiles
        ntr = math.ceil(m["height"] / m["tile_h"])
        ntc = math.ceil(m["width"] / m["tile_w"])
        tr0, tr1 = max(tr0, 0), min(tr1, ntr - 1)
        tc0, tc1 = max(tc0, 0), min(tc1, ntc - 1)
        if tr0 > tr1 or tc0 > tc1:
            continue  # zone entirely off-grid: joins no stored tile
        rects.setdefault(ds, []).append((tc0, tc1, tr0, tr1))
    return rects


def _coalesce_rects(rects: list, max_rects: int) -> list:
    """Dedup + containment-drop, then cap the rectangle count by grouping
    Morton-ordered neighbors and replacing each group with its bounding
    box (always a SUPERSET — pruning stays correct, only less tight).
    Morton ordering keeps grouped rects spatially close, so the group
    bboxes stay tight for clustered zones."""
    uniq = sorted(set(rects))
    if len(uniq) <= 4 * max_rects:
        # containment drop is O(n²) — only worth it (and only affordable
        # driver-side) when the set is already near the cap; larger sets
        # go straight to Morton grouping, which subsumes contained rects
        kept = []
        for r in uniq:
            if any(
                o[0] <= r[0] and r[1] <= o[1] and o[2] <= r[2] and r[3] <= o[3]
                for o in uniq
                if o != r
            ):
                continue
            kept.append(r)
    else:
        kept = uniq
    if len(kept) <= max_rects:
        return kept
    # boundless windows (clip_to_grid=False) can have negative centers;
    # K.quadkey rejects negatives — clamp for the SORT KEY only (mirrors
    # the F.greatest clamp in smj_bounds_filter; grouping tightness may
    # suffer at the grid edge, the emitted bounds never change)
    kept.sort(
        key=lambda r: K.quadkey(
            max(0, (r[0] + r[1]) // 2), max(0, (r[2] + r[3]) // 2)
        )
    )
    per = math.ceil(len(kept) / max_rects)
    out = []
    for i in range(0, len(kept), per):
        grp = kept[i : i + per]
        out.append(
            (
                min(g[0] for g in grp),
                max(g[1] for g in grp),
                min(g[2] for g in grp),
                max(g[3] for g in grp),
            )
        )
    return out


def _quad_cover_ranges(
    tc0: int, tc1: int, tr0: int, tr1: int, level: int
) -> list:
    """Inclusive level-``level`` Morton-code (quadkey) ranges covering the
    tile rectangle — the recursive quad-tree cover: a quad cell fully
    inside the rect emits its whole code range in one piece; partially
    overlapping cells subdivide. To bound the output for huge rects, cells
    at most ``cellcap`` tiles wide are accepted whole once they overlap at
    all (a SUPERSET — never loses a tile)."""
    span = max(tc1 - tc0 + 1, tr1 - tr0 + 1)
    cellcap = 1
    while cellcap * 8 < span:  # ≲ (8+2)^2 cells per rect before merging
        cellcap *= 2
    out: list = []

    def rec(prefix: int, size: int, cx0: int, cy0: int) -> None:
        if cx0 > tc1 or cy0 > tr1 or cx0 + size - 1 < tc0 or cy0 + size - 1 < tr0:
            return
        inside = (
            cx0 >= tc0 and cx0 + size - 1 <= tc1
            and cy0 >= tr0 and cy0 + size - 1 <= tr1
        )
        if inside or size <= cellcap:
            shift = 2 * int(math.log2(size))
            out.append((prefix << shift, ((prefix + 1) << shift) - 1))
            return
        half = size // 2
        for q in range(4):
            cbit, rbit = q & 1, q >> 1
            rec(
                (prefix << 2) | (rbit << 1) | cbit,
                half,
                cx0 + cbit * half,
                cy0 + rbit * half,
            )

    rec(0, 1 << level, 0, 0)
    return out


def _merge_ranges(ranges: list, max_ranges: int) -> list:
    """Sort + merge overlapping/adjacent inclusive ranges, then cap the
    count by KEEPING the ``max_ranges - 1`` largest gaps as separators
    (the optimal coalescing: the false-positive key space added is exactly
    the dropped gaps, so dropping the smallest gaps first adds the least)."""
    if not ranges:
        return []
    ranges = sorted(ranges)
    merged = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) > max_ranges:
        gaps = sorted(
            range(1, len(merged)),
            key=lambda i: merged[i][0] - merged[i - 1][1],
            reverse=True,
        )[: max_ranges - 1]
        keep = sorted(gaps)
        out = []
        start = 0
        for g in keep + [len(merged)]:
            out.append([merged[start][0], merged[g - 1][1]])
            start = g
        merged = out
    return [(lo, hi) for lo, hi in merged]


# coverage fraction of the union range above which per-zone granularity
# is collapsed back to the union (the disjunction would admit nearly
# everything anyway, so only the predicate overhead would remain)
_DENSE_FRAC = 0.5


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def quadkey_prune_ranges(
    geoms: dict,
    meta: dict,
    *,
    level: int = 16,
    pad_tiles: int = 0,
    max_ranges: int = 64,
) -> dict:
    """Per-dataset quadkey range sets covering every zone's tile window:
    ``{dataset: [(lo, hi), ...]}`` over the level-``level`` Morton code
    (sources/tables.with_quadkey layout: col bits even, row bits odd).
    Ranges are merged and capped at ``max_ranges`` per dataset by
    coalescing across the smallest gaps (superset-safe)."""
    out = {}
    grid = 1 << level
    for ds, rects in _zone_tile_rects(geoms, meta, pad_tiles=pad_tiles).items():
        if any(r[1] >= grid or r[3] >= grid for r in rects):
            # a grid wider than 2^level tiles overflows the Morton code
            # (with_quadkey drops the high bits, so distant tiles SHARE
            # codes); covering only the in-level window would silently
            # EXCLUDE real tiles — and so would ANY finite BETWEEN list
            # if storage was written at a HIGHER level than assumed here
            # (stored codes can exceed 4^level - 1). Emit the None
            # sentinel = no quadkey constraint at all for this dataset
            # (superset-safe: its scan keeps only the dataset clause)
            out[ds] = None
            continue
        # bound driver work for huge zone sets: past 4×max_ranges rects
        # the final cap collapses most ranges anyway, so coalesce rects
        # first (superset-safe) instead of covering 10⁵ rects one by one
        rects = _coalesce_rects(rects, 4 * max_ranges)
        ranges: list = []
        for tc0, tc1, tr0, tr1 in rects:
            ranges.extend(_quad_cover_ranges(tc0, tc1, tr0, tr1, level))
        out[ds] = _merge_ranges(ranges, max_ranges)
    return out


def tile_prune_filter(
    geoms: dict,
    meta: dict,
    *,
    pad_tiles: int = 0,
    max_ranges: int = 64,
    quadkey_col: str | None = None,
    quadkey_level: int = 16,
    prefix_col: str | None = None,
):
    """Scan-level tile-pruning predicate from the collected zone dim.

    At 100 TB this is the difference between scanning the planet and
    scanning the working set: the predicate reaches the parquet scan
    (PushedFilters), so row groups — and with dataset/tile-key partition
    or bucket layout, whole files — outside every zone's working set are
    never read. Correct by superset: any tile that could join a cover
    cell lies inside its zone's padded bbox rect (``pad_tiles`` widens
    every rect — the point operator's 2×2 bilinear windows reach 1 px
    past the vertex bbox). Returns None when nothing can be pruned.

    Two storage regimes:

    - ``quadkey_col=None`` (plain corpora): a capped disjunction of
      PER-ZONE (dataset, tile_col BETWEEN, tile_row BETWEEN) rectangles —
      unlike the old single union bbox, sparse scattered zone sets keep
      per-zone granularity until ``max_ranges`` rects, then coalesce
      Morton-ordered neighbors (still far tighter than one planet bbox).
    - ``quadkey_col='quadkey'`` (quadkey-sorted/Iceberg-style storage):
      per-zone quad-tree cover → ≤ ``max_ranges`` 1-D quadkey ranges per
      dataset. Because the corpus is SORTED by quadkey, each range maps
      to a contiguous run of row groups / files, so parquet min-max stats
      skip everything else — the reference's per-feature windowed read
      (io.py:292-362) done at storage level.
    """
    # Predicates are built as ONE SQL string handed to F.expr: composing
    # a 64-term disjunction from Column operators costs hundreds of py4j
    # round-trips (~2 s measured at 64 rects) and a 100+-node boolean
    # tree that Catalyst re-optimizes on EVERY action; the parsed string
    # costs one round-trip. Dense working sets additionally collapse to
    # their union range when per-zone granularity can't prune anyway
    # (coverage > _DENSE_FRAC of the union) — sparse scattered zones keep
    # full per-zone granularity, dense corpora keep the r3-cheap plan.
    parts = []
    if quadkey_col is not None:
        by_ds = quadkey_prune_ranges(
            geoms, meta, level=quadkey_level, pad_tiles=pad_tiles,
            max_ranges=max_ranges,
        )
        for ds, ranges in by_ds.items():
            if ranges is None:
                # Morton overflow (grid wider than 2^quadkey_level):
                # stored codes may exceed any range this level can
                # express — keep only the dataset clause (unpruned scan
                # for this dataset, never a wrong one)
                parts.append(f"(dataset = {_sql_str(ds)})")
                continue
            if not ranges:
                continue
            span = ranges[-1][1] - ranges[0][0] + 1
            cov = sum(hi - lo + 1 for lo, hi in ranges)
            if len(ranges) > 1 and cov > _DENSE_FRAC * span:
                ranges = [(ranges[0][0], ranges[-1][1])]
            rng = " OR ".join(
                f"{quadkey_col} BETWEEN {lo} AND {hi}" for lo, hi in ranges
            )
            clause = f"dataset = {_sql_str(ds)} AND ({rng})"
            if prefix_col is not None:
                # partitioned storage: an IN-list over the quad-prefix
                # partition column prunes whole DIRECTORIES at listing
                # time (PartitionFilters) before any file is opened; the
                # shift is re-derived from the SAME dataset grid dims the
                # writer used, so partition values always agree
                from ..sources.tables import dataset_prefix_shifts

                shift = dataset_prefix_shifts(meta)[ds]
                prefixes = sorted(
                    {
                        p
                        for lo, hi in ranges
                        for p in range(lo >> shift, (hi >> shift) + 1)
                    }
                )
                inlist = ", ".join(str(p) for p in prefixes)
                clause += f" AND {prefix_col} IN ({inlist})"
            parts.append(f"({clause})")
    else:
        for ds, rects in _zone_tile_rects(
            geoms, meta, pad_tiles=pad_tiles
        ).items():
            rects = _coalesce_rects(rects, max_ranges)
            if not rects:
                continue
            u = (
                min(r[0] for r in rects),
                max(r[1] for r in rects),
                min(r[2] for r in rects),
                max(r[3] for r in rects),
            )
            cov = sum(
                (r[1] - r[0] + 1) * (r[3] - r[2] + 1) for r in rects
            )
            area = (u[1] - u[0] + 1) * (u[3] - u[2] + 1)
            if len(rects) > 1 and cov > _DENSE_FRAC * area:
                rects = [u]
            rng = " OR ".join(
                f"(tile_col BETWEEN {tc0} AND {tc1} "
                f"AND tile_row BETWEEN {tr0} AND {tr1})"
                for tc0, tc1, tr0, tr1 in rects
            )
            parts.append(f"(dataset = {_sql_str(ds)} AND ({rng}))")
    if not parts:
        return None
    return F.expr(" OR ".join(parts))


def zone_cover_cells(
    zones: DataFrame,
    meta: dict,
    *,
    clip_to_grid: bool,
    max_cells_per_zone: int = 4_000_000,
    raise_beyond_extent: bool = False,
    with_geometry: bool = False,
    null_wkb_keys: frozenset | set | None = None,
) -> DataFrame:
    """Explode each zone into its covering tile keys (J1 filter phase).

    The bbox→window math is the reference's partition pruning
    (main.py:189-191, io.py:156-161) re-expressed as join-key generation.
    With ``clip_to_grid=False`` cells outside the tile grid are also emitted
    (they join to nothing and synthesize boundless nodata fill — J4).
    ``raise_beyond_extent`` reproduces the reference's boundless=False
    guard (io.py:323-326): a zone window outside the dataset extent raises.

    Cells are KEY-ONLY by default — geometry is attached downstream from
    the one-row-per-zone dim (broadcast_zone_geoms), never stored per
    (zone, tile). ``with_geometry=True`` carries the WKB on each cell row
    instead: the SMJ regime (zone set too large to broadcast/collect)
    needs it to ride the tile-key shuffle, which is cheaper than a second
    payload-bearing shuffle to attach geometry by zone afterwards —
    EXCEPT for zones in ``null_wkb_keys`` (the hybrid regime's few
    large-WKB × many-cell zones), whose cells carry NULL and whose
    geometry ships once per executor via a small broadcast dict instead
    of once per covering tile through the exchange.
    """
    null_wkb_keys = null_wkb_keys or frozenset()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_zid, out_ds, out_tc, out_tr, out_wkb = [], [], [], [], []
            for zid, ds, wkb in zip(
                pdf["zone_id"], pdf["dataset"], pdf["geometry_wkb"]
            ):
                m = meta.get(ds)
                if m is None:
                    raise ValueError(f"zone {zid}: unknown dataset {ds!r}")
                aff = m["affine"]
                geom = _effective_geom(wkb, aff)
                if raise_beyond_extent and K.beyond_extent(
                    K.bounds_window(G.geom_bounds(geom), aff),
                    (m["height"], m["width"]),
                ):
                    raise ValueError(
                        "Window/bounds is outside dataset extent, "
                        "boundless reads are disabled"
                    )
                tr0, tr1, tc0, tc1, ncells = _zone_tile_window(
                    geom, m, clip_to_grid
                )
                if ncells <= 0:
                    continue
                if ncells > max_cells_per_zone:
                    raise ValueError(
                        f"zone {zid} covers {ncells} tiles "
                        f"(> max_cells_per_zone={max_cells_per_zone})"
                    )
                trs = np.arange(tr0, tr1 + 1, dtype=np.int32)
                tcs = np.arange(tc0, tc1 + 1, dtype=np.int32)
                out_zid.append(np.full(ncells, zid, dtype=np.int64))
                out_ds.extend([ds] * ncells)
                out_tc.append(np.tile(tcs, len(trs)))
                out_tr.append(np.repeat(trs, len(tcs)))
                if with_geometry:
                    cell_wkb = None if (zid, ds) in null_wkb_keys else wkb
                    out_wkb.extend([cell_wkb] * ncells)
            if not out_ds:
                continue
            cols = {
                "zone_id": np.concatenate(out_zid),
                "dataset": out_ds,
                "tile_col": np.concatenate(out_tc),
                "tile_row": np.concatenate(out_tr),
            }
            if with_geometry:
                cols["geometry_wkb"] = out_wkb
            yield pd.DataFrame(cols)

    return spread(zones.select("zone_id", "dataset", "geometry_wkb")).mapInPandas(
        gen, _cells_schema(with_geometry)
    )


def zone_cell_counts(
    zones: DataFrame, meta: dict, *, clip_to_grid: bool = True
) -> DataFrame:
    """One row per zone: (zone_id, dataset, wkb_bytes, ncells) — the
    distributed sizing pass behind the hybrid-WKB regime. ncells uses the
    same _zone_tile_window derivation as zone_cover_cells, so the
    wkb_bytes × ncells duplication estimate is exactly what the cell
    generator would ship.

    The returned DataFrame carries a row-counting accumulator
    (``df._sizing_rows_acc``, also ``_LAST_SIZING_ACC``): each evaluation
    adds one per zone row, so tests can assert the pass ran ONCE (the
    caller persists it across its 2-3 consumers) — at 10⁹ zones a second
    evaluation would be a second full zones scan."""
    acc = zones.sparkSession.sparkContext.accumulator(0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "zone_id", "dataset", "wkb_bytes", "ncells",
                "tc0", "tc1", "tr0", "tr1",
            )}
            for zid, ds, wkb in zip(
                pdf["zone_id"], pdf["dataset"], pdf["geometry_wkb"]
            ):
                m = meta.get(ds)
                if m is None:
                    raise ValueError(f"zone {zid}: unknown dataset {ds!r}")
                geom = _effective_geom(wkb, m["affine"])
                tr0, tr1, tc0, tc1, ncells = _zone_tile_window(
                    geom, m, clip_to_grid
                )
                rows["zone_id"].append(zid)
                rows["dataset"].append(ds)
                rows["wkb_bytes"].append(len(wkb))
                rows["ncells"].append(ncells)
                rows["tc0"].append(tc0)
                rows["tc1"].append(tc1)
                rows["tr0"].append(tr0)
                rows["tr1"].append(tr1)
            acc.add(len(rows["zone_id"]))
            if rows["zone_id"]:
                yield pd.DataFrame(rows)

    out = spread(zones.select("zone_id", "dataset", "geometry_wkb")).mapInPandas(
        gen,
        "zone_id long, dataset string, wkb_bytes long, ncells long, "
        "tc0 long, tc1 long, tr0 long, tr1 long",
    )
    out._sizing_rows_acc = acc
    global _LAST_SIZING_ACC
    _LAST_SIZING_ACC = acc
    return out


# test hook: accumulator of the most recent sizing pass (see docstring)
_LAST_SIZING_ACC = None


def _max_zone_px(geoms: dict, meta: dict) -> int:
    """Largest per-zone bbox pixel window over the collected zone dim —
    the broadcast-regime size estimate feeding the auto holistic plan
    (superset of true zone pixels; same bounds math as the cover cells)."""
    mx = 0
    for (_zid, ds), wkb in geoms.items():
        m = meta.get(ds)
        if m is None:
            continue
        geom = _effective_geom(wkb, m["affine"])
        (r0, r1), (c0, c1) = K.bounds_window(G.geom_bounds(geom), m["affine"])
        mx = max(mx, max(0, r1 - r0) * max(0, c1 - c0))
    return mx


def auto_holistic_plan(
    est_px: int,
    *,
    want_exact_domain: bool,
    continuous: bool,
    threshold_px: int,
) -> str:
    """The driver-side heuristic behind ``holistic_mode='auto'`` (the
    default): returns 'exact', 'sketch' or 'salt'.

    - est_px ≤ threshold: 'exact' — every parity-scale corpus lands here
      (bit-equal to the reference; kernel merge cost is trivial).
    - above threshold, quantiles-only on a CONTINUOUS (float) raster:
      'sketch' — the exact (value,count) merge would move ~1 pair per
      pixel for a continent zone (no duplicates to collapse); the bounded
      quantile summary is the only plan whose state doesn't grow with px.
    - above threshold with the exact domain required on a CONTINUOUS
      raster: 'exact' — a salted pre-merge cannot collapse a domain with
      no duplicates, so it only re-serializes the full value multiset
      through a second pandas round while the final task still holds the
      same multiset (measured 4–5× slower on the 604 M-px corpus:
      247 s salted vs 51 s exact, identical results).
    - above threshold on an INTEGER (bounded-domain) raster needing the
      exact domain: 'salt' — cross-block duplicates collapse in the
      pre-merge, so the final merge sees ≤ salt × |domain| rows instead
      of one row per distinct (block, value).
    """
    if est_px <= threshold_px:
        return "exact"
    if continuous and not want_exact_domain:
        return "sketch"
    if continuous:
        return "exact"
    return "salt"


def _morton_expr(colc, colr, level: int = 16):
    """Morton interleave of two integer Columns (col bits even, row bits
    odd) — the JVM-expression twin of kernel.quadkey."""
    qk = None
    for k in range(level):
        cbit = F.shiftleft(
            F.shiftright(colc, k).bitwiseAND(F.lit(1)).cast("long"), 2 * k
        )
        rbit = F.shiftleft(
            F.shiftright(colr, k).bitwiseAND(F.lit(1)).cast("long"), 2 * k + 1
        )
        term = cbit.bitwiseOR(rbit)
        qk = term if qk is None else qk.bitwiseOR(term)
    return qk


def _smj_bucket_rows(counts: DataFrame, meta: dict | None, extra_aggs=()):
    """The sizing-pass bucket aggregation shared by smj_bounds_filter and
    smj_sizing_summary: per-zone tile windows grouped DISTRIBUTED by the
    quad-prefix of each window's center (≤64 Morton buckets per dataset,
    the same grid-adaptive shift the partition transform uses), each
    bucket's bounding rect aggregated — only tiny rows reach the driver.
    ``extra_aggs`` extends the aggregation so further per-dataset scalars
    (size estimate, hybrid cost bound) ride the SAME job instead of
    re-scanning the sizing table once per consumer."""
    if meta is not None:
        from ..sources.tables import dataset_prefix_shifts

        shifts = dataset_prefix_shifts(meta)
        cc = ((F.col("tc0") + F.col("tc1")) / 2).cast("long")
        cr = ((F.col("tr0") + F.col("tr1")) / 2).cast("long")
        # negative centers (zones off-grid left/top with clip_to_grid
        # False) break the bit interleave — clamp to 0 (bucketing only
        # affects grouping tightness, never the rect bounds)
        qk = _morton_expr(F.greatest(cc, F.lit(0)), F.greatest(cr, F.lit(0)))
        shift_case = " ".join(
            f"WHEN dataset = {_sql_str(ds)} THEN {sh}"
            for ds, sh in shifts.items()
        )
        grouped = counts.withColumn("_qk", qk).withColumn(
            "_b", F.expr(f"shiftright(_qk, CASE {shift_case} ELSE 0 END)")
        ).groupBy("dataset", "_b")
    else:
        grouped = counts.groupBy("dataset")
    return grouped.agg(
        F.min("tc0").alias("tc0"),
        F.max("tc1").alias("tc1"),
        F.min("tr0").alias("tr0"),
        F.max("tr1").alias("tr1"),
        *extra_aggs,
    ).collect()


def _rects_pred(by_ds: dict):
    """Per-dataset rect lists → the scan predicate (dense sets collapse
    to their union exactly as tile_prune_filter does)."""
    parts = []
    for ds, rects in by_ds.items():
        rects = _coalesce_rects(rects, 64)
        u = (
            min(r[0] for r in rects),
            max(r[1] for r in rects),
            min(r[2] for r in rects),
            max(r[3] for r in rects),
        )
        cov = sum((r[1] - r[0] + 1) * (r[3] - r[2] + 1) for r in rects)
        area = (u[1] - u[0] + 1) * (u[3] - u[2] + 1)
        if len(rects) > 1 and cov > _DENSE_FRAC * area:
            rects = [u]
        rng = " OR ".join(
            f"(tile_col BETWEEN {tc0} AND {tc1} "
            f"AND tile_row BETWEEN {tr0} AND {tr1})"
            for tc0, tc1, tr0, tr1 in rects
        )
        parts.append(f"(dataset = {_sql_str(ds)} AND ({rng}))")
    return F.expr(" OR ".join(parts)) if parts else None


def smj_bounds_filter(counts: DataFrame, meta: dict | None = None):
    """Scan pruning for the SMJ regime, where the zone geometries are
    never collected (see _smj_bucket_rows for the distributed grouping).
    Without ``meta`` (grid dims unknown) it falls back to one union bbox
    per dataset. Superset-safe by the same window math as the cover
    cells."""
    rows = _smj_bucket_rows(counts, meta)
    by_ds: dict = {}
    for r in rows:
        by_ds.setdefault(r["dataset"], []).append(
            (r["tc0"], r["tc1"], r["tr0"], r["tr1"])
        )
    return _rects_pred(by_ds)


def smj_sizing_summary(counts: DataFrame, meta: dict):
    """ONE job serving all three sizing-pass consumers (scan fence, auto-
    holistic size estimate, hybrid-WKB decision): the bucket aggregation
    of smj_bounds_filter extended with per-bucket max ncells and max
    wkb×ncells cost. Returns (pred, est_px, max_cost) where est_px is the
    largest per-zone bbox pixel estimate over all datasets and max_cost
    bounds every zone's per-cell WKB duplication — when it does not
    exceed the hybrid threshold, the per-zone top-cost query (a second
    read of the sizing table) is skipped entirely."""
    rows = _smj_bucket_rows(
        counts, meta,
        extra_aggs=(
            F.max("ncells").alias("_mx_cells"),
            F.max(F.col("wkb_bytes") * F.col("ncells")).alias("_mx_cost"),
        ),
    )
    by_ds: dict = {}
    est_px = 0
    max_cost = 0
    for r in rows:
        by_ds.setdefault(r["dataset"], []).append(
            (r["tc0"], r["tc1"], r["tr0"], r["tr1"])
        )
        m = meta.get(r["dataset"])
        if m is not None and r["_mx_cells"] is not None:
            est_px = max(est_px, r["_mx_cells"] * m["tile_w"] * m["tile_h"])
        if r["_mx_cost"] is not None:
            max_cost = max(max_cost, r["_mx_cost"])
    return _rects_pred(by_ds), est_px, max_cost


def hybrid_big_zone_geoms(
    zones: DataFrame,
    meta: dict,
    *,
    clip_to_grid: bool,
    threshold_bytes: int,
    max_zones: int = 4096,
    counts: DataFrame | None = None,
):
    """The hybrid-WKB selection for the SMJ regime (r3 verdict 'What's
    wrong #1'): find the zones whose per-cell WKB duplication
    (wkb_bytes × covering cells) would exceed ``threshold_bytes`` through
    the tile-key exchange — the MB-scale continent polygons covering
    10⁴-10⁶ tiles each — and ship exactly those once per executor via a
    broadcast dict instead. Returns (broadcast_dict_or_None, key_set);
    deterministic (ordered by duplication desc, then keys) and capped at
    ``max_zones`` rows / driver memory, which bounds the collect however
    huge the zone set is — zones past the cap simply stay inline, which
    is correct, just heavier."""
    spark = zones.sparkSession
    cost = F.col("wkb_bytes") * F.col("ncells")
    if counts is None:
        counts = zone_cell_counts(zones, meta, clip_to_grid=clip_to_grid)
    big = (
        counts.filter(cost > threshold_bytes)
        .orderBy(F.desc(cost), "zone_id", "dataset")
        .limit(max_zones)
        .collect()
    )
    if not big:
        return None, frozenset()
    keys = frozenset((r["zone_id"], r["dataset"]) for r in big)
    ids = list({r["zone_id"] for r in big})
    d = {}
    for row in (
        zones.filter(F.col("zone_id").isin(ids))
        .select("zone_id", "dataset", "geometry_wkb")
        .collect()
    ):
        k = (row["zone_id"], row["dataset"])
        if k in keys:
            d[k] = bytes(row["geometry_wkb"])
    return spark.sparkContext.broadcast(d), keys


# ---------------------------------------------------------------------------
# stage 2 — partial kernel
# ---------------------------------------------------------------------------

def _partial_schema(
    compact_vc: bool = False, with_band: bool = False, user_cols: tuple = ()
) -> T.StructType:
    """Partial-row schema. ``compact_vc`` packs the value-count arrays into
    BINARY blobs (float32-LE values + int32-LE counts, counts empty when
    they are all 1s) — lossless when the raster dtype is float32, half the
    bytes of double/long arrays, and — the bigger win — one memcpy per row
    through Arrow and the Tungsten shuffle instead of per-element array
    handling (measured ~2× on the holistic stage)."""
    vt = T.BinaryType() if compact_vc else T.ArrayType(T.DoubleType())
    ct = T.BinaryType() if compact_vc else T.ArrayType(T.LongType())
    return T.StructType(
        ([T.StructField("zone_id", T.LongType())]
         + ([T.StructField("band", T.IntegerType())] if with_band else []))
        + [
            T.StructField("count", T.LongType()),
            T.StructField("sum", T.DoubleType()),
            T.StructField("sum_i", T.LongType()),
            T.StructField("sumsq", T.DoubleType()),
            T.StructField("min", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
            T.StructField("nodata_count", T.LongType()),
            T.StructField("nan_count", T.LongType()),
            T.StructField("vc_vals", vt),
            T.StructField("vc_cnts", ct),
        ]
        + [T.StructField(f"u_{n}", T.ArrayType(T.DoubleType())) for n in user_cols]
    )


_PARTIAL_SCHEMA = _partial_schema(False)


def _cell_block(m, tile_row, tile_col, decoded, region, fill):
    """Pixel block for ``region`` (global window) inside one cell's nominal
    extent; pixels without stored data become nodata fill (J4 boundless).

    The windowed-read semantics mirror Raster.read (io.py:292-362) with the
    tile grid taking the place of the rasterio dataset. ``decoded`` is the
    tile's decoded pixel array (or None for a missing tile). ``fill`` must
    be the EFFECTIVE nodata (override if set, else dataset nodata, else
    -999) — the reference fills boundless reads with the effective value
    (io.py:331-340), so fill pixels always fail the validity test.
    """
    (rr0, rr1), (cc0, cc1) = region
    if decoded is None:
        out = np.full((rr1 - rr0, cc1 - cc0), fill, dtype=np.float64)
        return out
    # window relative to the tile's stored pixels
    row_off = tile_row * m["tile_h"]
    col_off = tile_col * m["tile_w"]
    rel = ((rr0 - row_off, rr1 - row_off), (cc0 - col_off, cc1 - col_off))
    if rel == ((0, decoded.shape[0]), (0, decoded.shape[1])):
        return decoded  # whole-tile region: no copy (callers don't mutate)
    return K.boundless_array(decoded, rel, fill)


def _pair_processor(
    meta: dict,
    *,
    all_touched: bool,
    nodata_override,
    want_counts: bool,
    zone_func,
    band: int,
    sketch_px,
    compact_vc: bool,
    bands,
    geoms,
    user_partials: dict,
):
    """Per-(zone, tile) refine body shared by BOTH kernel drivers (the
    joined-rows kernel and the tile-scan kernel): decode-aware, same
    masks/partials either way. Returns (process, geom_cache) where
    ``process(rows, zid, ds, tc, tr, payload, fmt, wkb, decoded)`` appends
    partial rows and returns the decoded tile array for reuse across the
    zones of one tile."""
    geom_cache = K.LRU(1024)

    def process(rows, zid, ds, tc, tr, payload, fmt, wkb=None, decoded=None):
        m = meta[ds]
        aff = m["affine"]
        key = (zid, ds)
        cached = geom_cache.get(key)
        if cached is None:
            if wkb is None:
                wkb = geoms.value[key]
            geom = _effective_geom(wkb, aff)
            pgeom = K.geom_to_pixel(geom, aff)
            win = K.bounds_window(G.geom_bounds(geom), aff)
            cached = (pgeom, win)
            geom_cache.put(key, cached)
        pgeom, win = cached
        (wr0, wr1), (wc0, wc1) = win
        # region = zone window ∩ this cell's nominal extent
        rr0 = max(wr0, tr * m["tile_h"])
        rr1 = min(wr1, (tr + 1) * m["tile_h"])
        cc0 = max(wc0, tc * m["tile_w"])
        cc1 = min(wc1, (tc + 1) * m["tile_w"])
        if rr0 >= rr1 or cc0 >= cc1:
            return decoded
        region = ((rr0, rr1), (cc0, cc1))
        rv = K.rasterize_pixgeom(pgeom, region, all_touched=all_touched)
        if not rv.any():
            return decoded
        if decoded is None and payload is not None:
            # native dtype end-to-end; stats accumulate in f64
            decoded = np.asarray(C.decode_tile(bytes(payload), fmt))
            if decoded.ndim == 3 and bands is None:
                decoded = decoded[band - 1]  # band select (S6)
        nd = nodata_override if nodata_override is not None else m["nodata"]
        nd = -999.0 if nd is None else nd  # io.py:331-340 default
        # int64-sum hint from the DATASET dtype: boundless pads may
        # promote a block to float64 (kernel.fill_dtype) but the
        # raster stays integer-semantics (kernel.partial_stats)
        int_sum = (
            bool(np.issubdtype(np.dtype(m["dtype"]), np.integer))
            if m.get("dtype") else None
        )
        if bands is not None:
            # one decode + one rasterize per pair, stats per band
            for bno in bands:
                db = None
                if decoded is not None:
                    db = decoded[bno - 1] if decoded.ndim == 3 else decoded
                block_b = _cell_block(m, tr, tc, db, region, nd)
                p = K.partial_stats(block_b, rv, nd, want_counts,
                                    sketch_px=sketch_px,
                                    int_sum=int_sum)
                if (p["count"] == 0 and p["nodata_count"] == 0
                        and p["nan_count"] == 0):
                    continue
                rows["zone_id"].append(zid)
                rows["band"].append(bno)
                _append_partial(rows, p, compact_vc)
            return decoded
        block = _cell_block(m, tr, tc, decoded, region, nd)
        if zone_func is not None and block is decoded:
            block = block.copy()  # user fn may mutate in place
        if zone_func is not None:
            # elementwise pre-transform (main.py:217-228); the masked
            # array the user fn sees is this partial's block
            is_float = np.issubdtype(block.dtype, np.floating)
            isnan = np.isnan(block) if is_float else np.zeros(block.shape, bool)
            masked = np.ma.MaskedArray(
                block, mask=((block == nd) | isnan | ~rv)
            )
            ret = zone_func(masked)
            if ret is not None:
                masked = ret
            tblock = np.ma.filled(masked.astype(np.float64), np.nan)
            cover2 = ~np.ma.getmaskarray(masked)
            p = K.partial_stats(
                tblock, cover2, None, want_counts, sketch_px=sketch_px
            )
            p["nodata_count"] = int(((block == nd) & rv).sum())
            p["nan_count"] = int((isnan & rv).sum())
        else:
            p = K.partial_stats(block, rv, nd, want_counts,
                                sketch_px=sketch_px, int_sum=int_sum)
        if (
            p["count"] == 0
            and p["nodata_count"] == 0
            and p["nan_count"] == 0
        ):
            return decoded
        rows["zone_id"].append(zid)
        _append_partial(rows, p, compact_vc)
        if user_partials:
            if zone_func is None:
                is_f = np.issubdtype(block.dtype, np.floating)
                bnan = (np.isnan(block) if is_f
                        else np.zeros(block.shape, bool))
                masked = np.ma.MaskedArray(
                    block, mask=((block == nd) | bnan | ~rv)
                )
            # (zone_func branch: `masked` is the post-transform
            # array, matching reference add_stats-after-zone_func)
            for uname, pfn in user_partials.items():
                st = np.asarray(pfn(masked), dtype=np.float64).ravel()
                rows[f"u_{uname}"].append(st.tolist())
        return decoded

    return process


def partial_kernel(
    joined: DataFrame,
    meta: dict,
    *,
    all_touched: bool,
    nodata_override,
    want_counts: bool,
    zone_func=None,
    band: int = 1,
    sketch_px: int | None = None,
    compact_vc: bool = False,
    bands: list | None = None,
    geoms=None,
    user_partials: dict | None = None,
) -> DataFrame:
    """Per-(zone, tile) refine + partial aggregation (J1 refine phase +
    P2-P5 masks + A1-A15 partial states).

    ``user_partials`` maps stat name → partial_fn(masked) returning a
    fixed-length float state vector per (zone, tile) block — the SCALABLE
    add_stats protocol (SURVEY §2.4 A18): the user fn runs on mergeable
    partials instead of a gathered whole-zone mosaic. The masked array it
    sees has the same semantics as the reference's (nodata/NaN/outside-
    zone masked), restricted to this partial's block; states merge via the
    matching merge_fn in merged_stats.

    Geometry arrives either via ``geoms`` (a Broadcast dict from
    broadcast_zone_geoms — the broadcast regime: WKB stored once per zone
    per executor, never per cell), as a per-row ``geometry_wkb`` column
    (the SMJ regime), or BOTH (the hybrid regime: large-WKB zones carry
    NULL per cell and resolve from the broadcast dict; everything else
    rides the column).

    With ``bands`` set, ONE pass emits per-band partial rows: the payload
    is decoded once and the zone rasterized once per (zone, tile) pair,
    shared across all requested bands (the multiband-in-one-pass path;
    mutually exclusive with zone_func)."""
    if bands is not None and zone_func is not None:
        raise ValueError("bands and zone_func cannot be combined")
    user_partials = user_partials or {}
    if bands is not None and user_partials:
        raise ValueError("bands and user add_stats cannot be combined")
    schema = _partial_schema(
        compact_vc, with_band=bands is not None, user_cols=tuple(user_partials)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        process = _pair_processor(
            meta, all_touched=all_touched, nodata_override=nodata_override,
            want_counts=want_counts, zone_func=zone_func, band=band,
            sketch_px=sketch_px, compact_vc=compact_vc, bands=bands,
            geoms=geoms, user_partials=user_partials,
        )
        tile_cache = K.LRU(64)
        for pdf in batches:
            rows = {name: [] for name in schema.fieldNames()}
            # prefer the per-row column whenever the cells carry it (SMJ /
            # hybrid regimes); the broadcast dict is the only source in
            # the broadcast regime and the fallback for hybrid NULL rows
            wkbs = pdf["geometry_wkb"] if "geometry_wkb" in pdf else None
            for i, (zid, ds, tc, tr, payload, fmt) in enumerate(zip(
                pdf["zone_id"], pdf["dataset"], pdf["tile_col"], pdf["tile_row"],
                pdf["bytes"], pdf["fmt"],
            )):
                wkb = None
                if wkbs is not None:
                    wkb = wkbs.iloc[i]
                    # hybrid regime: a large-WKB zone's cells carry NULL;
                    # its geometry ships once per executor (process falls
                    # back to the broadcast dict)
                decoded = None
                tkey = None
                if payload is not None:
                    tkey = (ds, tc, tr)
                    decoded = tile_cache.get(tkey)
                decoded = process(
                    rows, zid, ds, tc, tr, payload, fmt, wkb=wkb,
                    decoded=decoded,
                )
                if decoded is not None and tkey is not None:
                    tile_cache.put(tkey, decoded)
            if rows["zone_id"]:
                yield pd.DataFrame(rows)

    return joined.mapInPandas(gen, schema)


def broadcast_cover_cells(
    zones_spark,
    geoms: dict,
    meta: dict,
    *,
    max_cells_per_zone: int,
    raise_beyond_extent: bool,
):
    """Driver-side twin of zone_cover_cells for the broadcast regime: the
    zone dim is ALREADY collected (broadcast_zone_geoms), so the covering
    tile keys can be derived on the driver and shipped as one broadcast
    dict ``{(dataset, tile_col, tile_row): [zone_id, ...]}`` — the same
    information the broadcast hash relation of the cells⋈tiles join held,
    at the same memory class, but without the cells mapInPandas stage, the
    broadcast-exchange build job, or — the big one — the tile payload
    crossing Arrow once per covering ZONE instead of once per tile
    (measured 3.7× duplication on the bench corpus).

    Returns the Broadcast, or None when any zone would hit an error path
    (unknown dataset, beyond-extent with boundless=False, cover-cell cap):
    the caller then falls back to the executor-side generator so those
    errors keep surfacing lazily at action time, exactly as before."""
    cover: dict = {}
    for (zid, ds), wkb in geoms.items():
        m = meta.get(ds)
        if m is None:
            return None
        aff = m["affine"]
        geom = _effective_geom(wkb, aff)
        if raise_beyond_extent and K.beyond_extent(
            K.bounds_window(G.geom_bounds(geom), aff),
            (m["height"], m["width"]),
        ):
            return None
        tr0, tr1, tc0, tc1, ncells = _zone_tile_window(geom, m, True)
        if ncells <= 0:
            continue
        if ncells > max_cells_per_zone:
            return None
        for tr in range(tr0, tr1 + 1):
            for tc in range(tc0, tc1 + 1):
                cover.setdefault((ds, tc, tr), []).append(zid)
    return zones_spark.sparkContext.broadcast(cover)


def partial_kernel_tiles(
    tiles: DataFrame,
    meta: dict,
    cover,
    *,
    all_touched: bool,
    nodata_override,
    want_counts: bool,
    zone_func=None,
    band: int = 1,
    sketch_px: int | None = None,
    compact_vc: bool = False,
    bands: list | None = None,
    geoms=None,
    user_partials: dict | None = None,
) -> DataFrame:
    """The broadcast-regime kernel driven directly off the (pruned) tile
    scan: for each stored tile, look up its covering zones in the
    broadcast ``cover`` dict and emit the same partial rows the joined
    kernel would — zero joins, one Python stage, each payload decoded and
    Arrow-shipped exactly ONCE however many zones cover it. Downstream
    (zone-keyed merge, join-back) is unchanged, so results are identical
    up to partial-row order, which the merges don't observe."""
    if bands is not None and zone_func is not None:
        raise ValueError("bands and zone_func cannot be combined")
    user_partials = user_partials or {}
    if bands is not None and user_partials:
        raise ValueError("bands and user add_stats cannot be combined")
    schema = _partial_schema(
        compact_vc, with_band=bands is not None, user_cols=tuple(user_partials)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        process = _pair_processor(
            meta, all_touched=all_touched, nodata_override=nodata_override,
            want_counts=want_counts, zone_func=zone_func, band=band,
            sketch_px=sketch_px, compact_vc=compact_vc, bands=bands,
            geoms=geoms, user_partials=user_partials,
        )
        cov = cover.value
        for pdf in batches:
            rows = {name: [] for name in schema.fieldNames()}
            for ds, tc, tr, payload, fmt in zip(
                pdf["dataset"], pdf["tile_col"], pdf["tile_row"],
                pdf["bytes"], pdf["fmt"],
            ):
                zids = cov.get((ds, tc, tr))
                if not zids:
                    continue  # scan false positive: covers no zone
                decoded = None
                for zid in zids:
                    decoded = process(
                        rows, zid, ds, tc, tr, payload, fmt, decoded=decoded
                    )
            if rows["zone_id"]:
                yield pd.DataFrame(rows)

    return tiles.select(
        "dataset", "tile_col", "tile_row", "bytes", "fmt"
    ).mapInPandas(gen, schema)


def partial_kernel_grouped(
    joined: DataFrame,
    meta: dict,
    *,
    all_touched: bool,
    nodata_override,
    want_counts: bool,
    zone_func=None,
    band: int = 1,
    sketch_px: int | None = None,
    compact_vc: bool = False,
    bands: list | None = None,
    geoms=None,
    user_partials: dict | None = None,
) -> DataFrame:
    """The SMJ-regime kernel over tile-grouped join rows: each input row
    is one tile carrying its covering zones as an array of (zone_id,
    geometry_wkb) structs (NULL wkb = hybrid big-zone, resolved from the
    broadcast dict). Same per-pair math as the other kernel drivers via
    _pair_processor; each payload decoded and Arrow-shipped once per
    tile."""
    if bands is not None and zone_func is not None:
        raise ValueError("bands and zone_func cannot be combined")
    user_partials = user_partials or {}
    if bands is not None and user_partials:
        raise ValueError("bands and user add_stats cannot be combined")
    schema = _partial_schema(
        compact_vc, with_band=bands is not None, user_cols=tuple(user_partials)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        process = _pair_processor(
            meta, all_touched=all_touched, nodata_override=nodata_override,
            want_counts=want_counts, zone_func=zone_func, band=band,
            sketch_px=sketch_px, compact_vc=compact_vc, bands=bands,
            geoms=geoms, user_partials=user_partials,
        )
        for pdf in batches:
            rows = {name: [] for name in schema.fieldNames()}
            for ds, tc, tr, zs, payload, fmt in zip(
                pdf["dataset"], pdf["tile_col"], pdf["tile_row"],
                pdf["zs"], pdf["bytes"], pdf["fmt"],
            ):
                decoded = None
                for z in zs:
                    decoded = process(
                        rows, z["zone_id"], ds, tc, tr, payload, fmt,
                        wkb=z["geometry_wkb"], decoded=decoded,
                    )
            if rows["zone_id"]:
                yield pd.DataFrame(rows)

    return joined.select(
        "dataset", "tile_col", "tile_row", "zs", "bytes", "fmt"
    ).mapInPandas(gen, schema)


def _append_partial(rows: dict, p: dict, compact_vc: bool) -> None:
    rows["count"].append(p["count"])
    rows["sum"].append(p["sum"])
    rows["sum_i"].append(p["sum_i"])
    rows["sumsq"].append(p["sumsq"])
    rows["min"].append(p["min"])
    rows["max"].append(p["max"])
    rows["nodata_count"].append(p["nodata_count"])
    rows["nan_count"].append(p["nan_count"])
    if compact_vc:
        rows["vc_vals"].append(
            p["vc_vals"].astype(np.float32, copy=False).tobytes()
        )
        rows["vc_cnts"].append(
            b"" if p.get("vc_ones")
            else p["vc_cnts"].astype(np.int32, copy=False).tobytes()
        )
    else:
        rows["vc_vals"].append(p["vc_vals"])
        rows["vc_cnts"].append(p["vc_cnts"])


# ---------------------------------------------------------------------------
# stage 3 — merges
# ---------------------------------------------------------------------------


def _merged_schema(
    pctiles: list[str], want_vc: bool, with_band: bool = False,
    user_cols: tuple = (),
) -> T.StructType:
    fields = [T.StructField("zone_id", T.LongType())]
    if with_band:
        fields.append(T.StructField("band", T.IntegerType()))
    fields += [
        T.StructField("count", T.LongType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("sum_i", T.LongType()),
        T.StructField("sumsq", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("nodata_count", T.LongType()),
        T.StructField("nan_count", T.LongType()),
        T.StructField("median", T.DoubleType()),
        T.StructField("majority", T.DoubleType()),
        T.StructField("minority", T.DoubleType()),
        T.StructField("unique", T.LongType()),
    ]
    fields += [T.StructField(p, T.DoubleType()) for p in pctiles]
    if want_vc:
        fields.append(
            T.StructField("value_counts", T.MapType(T.DoubleType(), T.LongType()))
        )
    # user stats stay u_-prefixed until the final projection so names can
    # never collide with internal state columns (sum, sumsq, ...)
    fields += [T.StructField(f"u_{n}", T.DoubleType()) for n in user_cols]
    return T.StructType(fields)


def _row_vc(v, c):
    """One partial's (values, counts) in float64/int64, whatever the wire
    format: double/long arrays (default), float32/int32 binary blobs
    (compact), and empty counts meaning "one each" (all-distinct blocks)."""
    if isinstance(v, (bytes, bytearray)):
        vals = np.frombuffer(v, dtype=np.float32).astype(np.float64)
    else:
        vals = np.asarray(v, dtype=np.float64)
    if c is None or len(c) == 0:
        cnts = np.ones(vals.size, dtype=np.int64)
    elif isinstance(c, (bytes, bytearray)):
        cnts = np.frombuffer(c, dtype=np.int32).astype(np.int64)
    else:
        cnts = np.asarray(c, dtype=np.int64)
    return vals, cnts


def _merge_vc(pdf: pd.DataFrame):
    """Merge per-partial (value, count) arrays: concat → unique → scatter-add.
    Associative, so it works as both the salted pre-merge and the final."""
    return _merge_vc_arrays(list(pdf["vc_vals"]), list(pdf["vc_cnts"]))


def _merge_scalars(pdf: pd.DataFrame) -> dict:
    """Fold a zone's partial rows into one scalar state (A1-A6, A13-A14)."""
    si = pdf["sum_i"]
    mins, maxs = pdf["min"].dropna(), pdf["max"].dropna()
    return {
        "count": int(pdf["count"].sum()),
        "sum": float(pdf["sum"].sum()),
        "sum_i": int(si.dropna().sum()) if si.notna().any() else None,
        "sumsq": float(pdf["sumsq"].sum()),
        "min": float(mins.min()) if len(mins) else None,
        "max": float(maxs.max()) if len(maxs) else None,
        "nodata_count": int(pdf["nodata_count"].sum()),
        "nan_count": int(pdf["nan_count"].sum()),
    }


def _holistic_only_schema(pctiles, want_vc, with_band=False) -> T.StructType:
    fields = [T.StructField("zone_id", T.LongType())]
    if with_band:
        fields.append(T.StructField("band", T.IntegerType()))
    fields += [
        T.StructField("median", T.DoubleType()),
        T.StructField("majority", T.DoubleType()),
        T.StructField("minority", T.DoubleType()),
        T.StructField("unique", T.LongType()),
    ]
    fields += [T.StructField(p, T.DoubleType()) for p in pctiles]
    if want_vc:
        fields.append(
            T.StructField("value_counts", T.MapType(T.DoubleType(), T.LongType()))
        )
    return T.StructType(fields)


def exploded_holistic(
    partials: DataFrame,
    pctiles: list[str],
    want_vc: bool,
    *,
    keys: tuple = ("zone_id",),
) -> DataFrame:
    """EXACT holistic stats via a distributed (zone, value) aggregation —
    the scale path for SKEWED zones over high-duplication rasters.

    The single-task bound of the in-task merge (a continent-sized zone's
    whole value multiset sorted in one applyInPandas task) becomes a JVM
    hash aggregation keyed (zone, value): map-side combine collapses
    duplicate values BEFORE the shuffle, the exchange moves one row per
    DISTINCT (zone, value), and the final per-zone task holds only the
    distinct domain. Measured on the 604 M-px scaling corpus (3 zones
    covering all 9,216 tiles each): 197 s → see BENCH.md. For all-distinct
    data this degenerates to a pixel-count shuffle — use
    holistic_mode='auto' (sketch) there instead.
    """
    with_band = "band" in keys
    schema = _holistic_only_schema(pctiles, want_vc, with_band=with_band)
    qs = [K.get_percentile(p) for p in pctiles]
    kv = F.explode(F.arrays_zip("vc_vals", "vc_cnts")).alias("kv")
    rows = (
        partials.select(*keys, kv)
        .select(
            *keys,
            F.col("kv.vc_vals").alias("val"),
            F.col("kv.vc_cnts").alias("cnt"),
        )
        .groupBy(*keys, "val")
        .agg(F.sum("cnt").alias("cnt"))
    )

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        row: dict = {k: [pdf[k].iloc[0]] for k in keys}
        vals = pdf["val"].to_numpy(dtype=np.float64)
        cnts = pdf["cnt"].to_numpy(dtype=np.int64)
        o = np.argsort(vals, kind="stable")
        vals, cnts = vals[o], cnts[o]
        row["median"] = [K.weighted_percentile(vals, cnts, 50.0)]
        row["majority"] = [float(vals[int(np.argmax(cnts))])]
        row["minority"] = [float(vals[int(np.argmin(cnts))])]
        row["unique"] = [int(vals.size)]
        for p, q in zip(pctiles, qs):
            row[p] = [K.weighted_percentile(vals, cnts, q)]
        if want_vc:
            row["value_counts"] = [dict(zip(vals.tolist(), cnts.tolist()))]
        return pd.DataFrame(row)

    return rows.groupBy(*keys).applyInPandas(fin, schema)


def _merge_vc_arrays(vlist, clist):
    """Merge per-partial (vals, cnts) sequences into one sorted unique
    (values, counts) pair. Two fast paths for the dominant wire shapes:
    compact float32 blobs concatenate as ONE buffer (a single frombuffer +
    astype instead of one per partial), and when every partial's counts
    are implicit ones (all-distinct blocks — the continuous-raster case)
    the merged counts are just np.unique's return_counts, skipping the
    big ones array and the scatter-add. Identical values either way."""
    ones = all(c is None or len(c) == 0 for c in clist)
    if all(isinstance(v, (bytes, bytearray)) for v in vlist):
        # unique in the float32 domain (float32→float64 is injective and
        # order-preserving, so the grouping is identical) — the sort runs
        # over half the bytes; only the much smaller unique array is
        # widened to float64 for the downstream percentile math
        vals32 = np.frombuffer(b"".join(vlist), dtype=np.float32)
        if ones:
            u, cnt = np.unique(vals32, return_counts=True)
            return u.astype(np.float64), cnt.astype(np.int64, copy=False)
        vals = vals32.astype(np.float64)
    else:
        vals = np.concatenate(
            [_row_vc(v, None)[0] for v in vlist] or [np.empty(0)]
        )
        if ones:
            u, cnt = np.unique(vals, return_counts=True)
            return u, cnt.astype(np.int64, copy=False)
    cnts = np.concatenate(
        [_row_vc(v, c)[1] for v, c in zip(vlist, clist)]
        or [np.empty(0, dtype=np.int64)]
    )
    u, inv = np.unique(vals, return_inverse=True)
    merged = np.zeros(len(u), dtype=np.int64)
    np.add.at(merged, inv, cnts)
    return u, merged


def merged_stats(
    partials: DataFrame,
    pctiles: list[str],
    want_vc: bool,
    *,
    salt: int | None = None,
    recompress_px: int | None = None,
    keys: tuple = ("zone_id",),
    user_merges: dict | None = None,
    vectorized: bool = False,
) -> DataFrame:
    """Scalar AND holistic merges in ONE zone-keyed applyInPandas (A1-A15).
    ``keys`` extends the grouping (e.g. ("zone_id", "band") for the
    multiband one-pass path).

    ``user_merges`` maps stat name → (merge_fn, finalize_fn): merge_fn
    folds the stacked per-partial state vectors (k×len float64 ndarray)
    into one state, finalize_fn turns the merged state into the output
    scalar — the merge half of the scalable add_stats protocol. merge_fn
    must be associative (it also runs in the salted pre-merge).

    One shuffle, and — unlike two separate aggregations consuming the same
    ``partials`` subtree — the upstream partial kernel (decode + rasterize)
    is evaluated exactly once. Per-task memory is bounded by the zone's
    distinct-value count (exact mode) or by salt × recompress_px points
    (sketch mode).

    ``salt`` enables the two-stage merge for hot zones: a pre-merge keyed by
    (zone_id, upstream-partition-salt) collapses duplicate values early, so
    the final merge sees ≤salt rows per zone. ``recompress_px`` additionally
    re-sketches each pre-merged array to that many points (the scale path
    for continuous rasters whose value domain has no duplicates to collapse
    — kernel.sketch_weighted keeps count/min/max exact, quantile rank error
    ≤ n/recompress_px).

    ``vectorized=True`` (the broadcast regime) runs the FINAL merge as one
    hash-repartition + mapInPandas over whole partitions instead of
    per-group applyInPandas: scalar folds become ONE pandas groupby
    aggregation (C speed) across every zone in the partition, and Python
    touches each group only for the holistic array merge — measured ~0.5 s
    of pure per-group DataFrame overhead on the 2008-zone bench corpus.
    Identical per-zone math. The SMJ regime keeps applyInPandas because
    its output partitioning (hash on the group keys) feeds the join-back
    without a new exchange, which matters at 10⁹ zones.
    """
    with_band = "band" in keys
    user_merges = user_merges or {}
    schema = _merged_schema(
        pctiles, want_vc, with_band=with_band, user_cols=tuple(user_merges)
    )
    qs = [K.get_percentile(p) for p in pctiles]

    def _merge_user(pdf: pd.DataFrame, finalize: bool) -> dict:
        out = {}
        for uname, (mfn, ffn) in user_merges.items():
            states = np.asarray(
                [np.asarray(s, dtype=np.float64) for s in pdf[f"u_{uname}"]]
            )
            merged = np.asarray(mfn(states), dtype=np.float64).ravel()
            if finalize:
                v = ffn(merged)
                out[f"u_{uname}"] = [None if v is None else float(v)]
            else:
                out[f"u_{uname}"] = [merged.tolist()]
        return out

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        row: dict = {k: [pdf[k].iloc[0]] for k in keys}
        for k, v in _merge_scalars(pdf).items():
            row[k] = [v]
        row.update(_merge_user(pdf, True))
        vals, cnts = _merge_vc(pdf)
        if vals.size == 0:
            for name in ("median", "majority", "minority", "unique"):
                row[name] = [None]
            for p in pctiles:
                row[p] = [None]
            if want_vc:
                row["value_counts"] = [None]
        else:
            row["median"] = [K.weighted_percentile(vals, cnts, 50.0)]
            row["majority"] = [float(vals[int(np.argmax(cnts))])]
            row["minority"] = [float(vals[int(np.argmin(cnts))])]
            row["unique"] = [int(vals.size)]
            for p, q in zip(pctiles, qs):
                row[p] = [K.weighted_percentile(vals, cnts, q)]
            if want_vc:
                row["value_counts"] = [dict(zip(vals.tolist(), cnts.tolist()))]
        return pd.DataFrame(row)

    if salt:

        def pre(pdf: pd.DataFrame) -> pd.DataFrame:
            row: dict = {k: [pdf[k].iloc[0]] for k in keys}
            for k, v in _merge_scalars(pdf).items():
                row[k] = [v]
            row.update(_merge_user(pdf, False))
            vals, cnts = _merge_vc(pdf)
            if recompress_px:
                vals, cnts = K.sketch_weighted(vals, cnts, recompress_px)
            row["vc_vals"] = [vals.tolist()]
            row["vc_cnts"] = [cnts.tolist()]
            return pd.DataFrame(row)

        partials = (
            partials.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt)))
            .groupBy(*keys, "_salt")
            .applyInPandas(
                lambda pdf: pre(pdf.drop(columns=["_salt"])),
                _partial_schema(
                    False, with_band=with_band, user_cols=tuple(user_merges)
                ),
            )
        )
    if not vectorized:
        return partials.groupBy(*keys).applyInPandas(finalize, schema)

    key_list = list(keys)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        big = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        gb = big.groupby(key_list, sort=False, dropna=False)
        scal = gb.agg(
            count=("count", "sum"),
            fsum=("sum", "sum"),
            sumsq=("sumsq", "sum"),
            mn=("min", "min"),
            mx=("max", "max"),
            nodata_count=("nodata_count", "sum"),
            nan_count=("nan_count", "sum"),
        )
        # min_count=1 → NaN when every partial's sum_i is null (float
        # raster), matching _merge_scalars' dropna/notna contract
        sum_i = gb["sum_i"].sum(min_count=1)
        vvals = big["vc_vals"].to_numpy(dtype=object)
        vcnts = big["vc_cnts"].to_numpy(dtype=object)
        ucols = {u: big[f"u_{u}"].to_numpy(dtype=object) for u in user_merges}
        out: dict = {name: [] for name in schema.fieldNames()}
        for gkey, idx in gb.indices.items():
            kt = gkey if isinstance(gkey, tuple) else (gkey,)
            for kname, kval in zip(keys, kt):
                out[kname].append(kval)
            srow = scal.loc[gkey]
            out["count"].append(int(srow["count"]))
            out["sum"].append(float(srow["fsum"]))
            si = sum_i.loc[gkey]
            out["sum_i"].append(None if pd.isna(si) else int(si))
            out["sumsq"].append(float(srow["sumsq"]))
            mn, mx = srow["mn"], srow["mx"]
            out["min"].append(None if pd.isna(mn) else float(mn))
            out["max"].append(None if pd.isna(mx) else float(mx))
            out["nodata_count"].append(int(srow["nodata_count"]))
            out["nan_count"].append(int(srow["nan_count"]))
            for uname, (mfn, ffn) in user_merges.items():
                states = np.asarray(
                    [np.asarray(s, dtype=np.float64) for s in ucols[uname][idx]]
                )
                merged = np.asarray(mfn(states), dtype=np.float64).ravel()
                v = ffn(merged)
                out[f"u_{uname}"].append(None if v is None else float(v))
            vals, cnts = _merge_vc_arrays(vvals[idx], vcnts[idx])
            if vals.size == 0:
                for name in ("median", "majority", "minority", "unique"):
                    out[name].append(None)
                for p in pctiles:
                    out[p].append(None)
                if want_vc:
                    out["value_counts"].append(None)
            else:
                out["median"].append(K.weighted_percentile(vals, cnts, 50.0))
                out["majority"].append(float(vals[int(np.argmax(cnts))]))
                out["minority"].append(float(vals[int(np.argmin(cnts))]))
                out["unique"].append(int(vals.size))
                for p, q in zip(pctiles, qs):
                    out[p].append(K.weighted_percentile(vals, cnts, q))
                if want_vc:
                    out["value_counts"].append(
                        dict(zip(vals.tolist(), cnts.tolist()))
                    )
        yield pd.DataFrame(out)

    return partials.repartition(*[F.col(k) for k in keys]).mapInPandas(
        gen, schema
    )


# ---------------------------------------------------------------------------
# the operator
# ---------------------------------------------------------------------------


def _band_base(zones: DataFrame, bands) -> DataFrame:
    """Join-back base: one row per zone (or per zone × requested band)."""
    base = zones.select("zone_id")
    if bands is None:
        return base
    spark = zones.sparkSession
    bdf = spark.createDataFrame([(int(b),) for b in bands], "band int")
    return base.crossJoin(F.broadcast(bdf))


def zonal_stats_df(
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
    broadcast_zones: bool = True,
    max_cells_per_zone: int = 4_000_000,
    holistic_salt: int | None = None,
    holistic_mode: str = "auto",
    auto_px_per_zone: int = 8 << 20,
    sketch_px: int = 1024,
    meta: dict | None = None,
    band: int = 1,
    bands: list | None = None,
    add_stats: dict | None = None,
    prune_tiles: bool = True,
    hybrid_wkb_bytes: int | None = 16 << 20,
    quadkey_level: int = 16,
) -> DataFrame:
    """Zonal statistics of the tile corpus aggregated to zone geometries.

    ``add_stats`` here is the SCALABLE user-stat protocol (SURVEY §2.4
    A18): ``{name: (partial_fn, merge_fn, finalize_fn)}``. partial_fn sees
    each (zone, tile) partial's masked array and returns a fixed-length
    float state vector; merge_fn folds stacked states associatively;
    finalize_fn produces the output scalar. Unlike the gather tier
    (operators/gather.py, which accepts plain callables but mosaics each
    zone into ONE task), this path keeps user stats fully distributed —
    the right surface for decomposable statistics at 100-TB scale.

    Parameters mirror gen_zonal_stats (reference main.py:57-156) where they
    exist; distribution knobs are new. ``zones`` needs (zone_id,
    geometry_wkb[, dataset]); ``tiles``/``datasets`` follow the corpus
    schema (fixtures.py). Returns one row per zone_id with requested stat
    columns (empty zones: count=0, others null — main.py:230-234).

    ``broadcast_zones=True`` hints the cover-cell side into a broadcast
    hash join so the tile scan is never shuffled — the right plan whenever
    the zone working set fits executor memory. With huge zone sets, pass
    False to fall back to a sort-merge join on the tile key; there,
    ``hybrid_wkb_bytes`` bounds per-cell WKB duplication by broadcasting
    the geometries of zones whose wkb×cells product exceeds it (the few
    continent polygons), so shuffle bytes scale with zone count + small
    WKBs, never WKB×cells. ``None`` disables the sizing pass.

    ``bands=[1, 2, ...]`` computes stats for SEVERAL bands in one pass —
    each payload decoded once, each zone rasterized once per covering tile,
    output long format with a ``band`` column (one row per zone × band).

    ``quadkey_level`` must match the level the tile corpus's quadkey
    column was written with (sources/tables.with_quadkey default 16) —
    pruning ranges are computed over that Morton code space. A grid too
    wide for the level is detected and that dataset's scan simply goes
    unpruned (never wrongly pruned).

    ``holistic_mode`` (median/percentiles/majority/minority/unique/
    value_counts execution): ``'auto'`` (default) picks the plan from the
    per-zone size estimate the regime already has (the collected zone dim,
    or the SMJ sizing pass) — zones up to ``auto_px_per_zone`` bbox pixels
    run the EXACT merge (bit-equal to the reference; every parity corpus),
    larger zones pick the deterministic quantile sketch when only
    quantiles are wanted on a continuous float raster, else a salted
    two-stage exact merge (see auto_holistic_plan). ``'exact'`` forces the
    exact merge at any size, ``'sketch'`` forces the bounded summary
    (quantiles only), ``'exploded'`` runs the distributed (zone, value)
    JVM aggregation.
    """
    stats, run_count = K.check_stats(stats, categorical)
    pctiles = [s for s in stats if s.startswith("percentile_")]
    want_holistic = run_count or "median" in stats or bool(pctiles)
    want_vc = bool(categorical)
    add_stats = add_stats or {}
    for uname, triple in add_stats.items():
        if not (isinstance(triple, (tuple, list)) and len(triple) == 3
                and all(callable(f) for f in triple)):
            raise ValueError(
                f"add_stats[{uname!r}] must be a (partial_fn, merge_fn, "
                "finalize_fn) triple here — plain callables take the "
                "gather tier (zonal_gather_df / gen_zonal_stats)"
            )
        if uname in K.VALID_STATS or uname in stats:
            raise ValueError(f"add_stats name {uname!r} shadows a builtin stat")
    if add_stats and holistic_mode == "exploded":
        raise ValueError("add_stats is not supported with holistic_mode='exploded'")
    if add_stats and bands is not None:
        raise ValueError("bands and add_stats cannot be combined")
    need_missing = boundless and ("nodata" in stats or "nan" in stats)
    # sketch eligibility: majority/minority/unique/value_counts need the
    # EXACT value domain; median/percentiles alone can run on the bounded
    # quantile summary (the 100×-scale path for continuous float rasters)
    want_exact_domain = run_count or want_vc
    if holistic_mode not in ("exact", "auto", "sketch", "exploded"):
        raise ValueError(
            "holistic_mode must be 'exact', 'auto', 'sketch' or 'exploded'"
        )
    if holistic_mode == "sketch" and want_exact_domain:
        raise ValueError(
            "holistic_mode='sketch' cannot compute majority/minority/unique/"
            "value_counts — those stats need the exact value domain"
        )
    use_sketch = (
        want_holistic and not want_exact_domain and holistic_mode == "sketch"
    )
    # 'auto' (the default) defers the exact/sketch/salt choice until the
    # per-zone size estimate is available below — parity-small corpora
    # stay EXACT, planetary zones pick the scale plan with no knob
    auto_holistic = (
        holistic_mode == "auto" and (want_holistic or want_vc)
    )

    meta = meta if meta is not None else collect_dataset_meta(datasets)
    if dataset is not None:
        if dataset not in meta:
            raise ValueError(
                f"dataset {dataset!r} not in datasets table "
                f"(have: {sorted(meta)})"
            )
        for b in (bands if bands is not None else [band]):
            if b > meta[dataset].get("band_count", 1) or b < 1:
                raise ValueError(
                    f"band {b} out of range for dataset {dataset!r} "
                    f"(band_count={meta[dataset].get('band_count', 1)})"
                )
        zones = zones.withColumn("dataset", F.lit(dataset))

    # broadcast regime: cells are KEY-ONLY (4 small columns) and geometry
    # ships once per zone via a broadcast dict — never once per covering
    # tile (the r2 verdict's 100×-scale memory risk). SMJ regime: the WKB
    # rides the cells through the tile-key shuffle instead (one copy per
    # cell through ONE exchange, vs a second payload-bearing shuffle to
    # re-attach it by zone) — EXCEPT the few zones whose wkb_bytes×ncells
    # duplication exceeds hybrid_wkb_bytes (an MB-scale continent polygon
    # over 10⁴-10⁶ tiles would push GB-TB through that exchange): those
    # ship once per executor via a small broadcast dict and their cells
    # carry NULL (the hybrid regime; None disables the sizing pass).
    big_keys: frozenset = frozenset()
    geoms_bc = None
    est_px = 0  # auto-holistic size estimate (filled per regime below)
    if broadcast_zones:
        geoms_bc = broadcast_zone_geoms(zones)
        if auto_holistic:
            est_px = _max_zone_px(geoms_bc.value, meta)
    elif hybrid_wkb_bytes is not None or prune_tiles or auto_holistic:
        # SMJ regime: ONE distributed sizing pass over the zone table,
        # summarized by ONE aggregation job that serves all three
        # consumers — hybrid-WKB decision, (collect-free) scan fence AND
        # the auto-holistic size estimate (three separate collects in
        # earlier rounds). The tiny sizing table (8 narrow columns/zone)
        # is persisted only when the hybrid per-zone top-cost query may
        # actually need a second read, which the summary's max-cost bound
        # decides — so the zones table is still scanned exactly once
        # (asserted in tests/test_r5_fixes.py via the sizing accumulator)
        counts = zone_cell_counts(zones, meta, clip_to_grid=not need_missing)
        if hybrid_wkb_bytes is not None:
            counts = counts.persist()
        try:
            pred, est, max_cost = smj_sizing_summary(counts, meta)
            if prune_tiles and pred is not None:
                tiles = tiles.filter(pred)
            if auto_holistic:
                est_px = est
            if hybrid_wkb_bytes is not None and max_cost > hybrid_wkb_bytes:
                geoms_bc, big_keys = hybrid_big_zone_geoms(
                    zones, meta, clip_to_grid=not need_missing,
                    threshold_bytes=hybrid_wkb_bytes, counts=counts,
                )
        finally:
            if hybrid_wkb_bytes is not None:
                counts.unpersist()
    if auto_holistic:
        refd_ds = (
            [dataset] if dataset is not None
            else sorted({ds for _, ds in geoms_bc.value}) if broadcast_zones
            else list(meta)
        )
        continuous = all(
            np.issubdtype(np.dtype(meta[d].get("dtype", "float64")), np.floating)
            for d in refd_ds
            if d in meta
        )
        plan = auto_holistic_plan(
            est_px,
            want_exact_domain=want_exact_domain,
            continuous=continuous,
            threshold_px=auto_px_per_zone,
        )
        if plan == "sketch":
            use_sketch = want_holistic
        elif plan == "salt" and holistic_salt is None:
            holistic_salt = 16
    if broadcast_zones and prune_tiles:
        # scan-level pruning: the zone dim is already on the driver, so a
        # per-zone tile-key range predicate costs nothing to build and
        # reaches the parquet scan as PushedFilters — the tile table reads
        # only the zones' working set, not the whole corpus. Corpora that
        # carry a quadkey column (with_quadkey; sorted storage) get 1-D
        # quadkey range sets, which align with row groups/files.
        pred = tile_prune_filter(
            geoms_bc.value, meta,
            quadkey_col="quadkey" if "quadkey" in tiles.columns else None,
            quadkey_level=quadkey_level,
            prefix_col="qk_prefix" if "qk_prefix" in tiles.columns else None,
        )
        if pred is not None:
            tiles = tiles.filter(pred)

    # broadcast fast path: the zone dim is on the driver already, so the
    # cover cells are derived THERE and broadcast as a dict — no cells
    # stage, no join, each tile payload crosses Arrow once (guide §8:
    # decide with small rows, move big rows once). Zones that would hit a
    # lazy error path (beyond-extent, cover cap, unknown dataset) return
    # None and fall through to the executor-side generator + join plan, so
    # error timing and messages are unchanged.
    fast_cover = None
    if broadcast_zones and not need_missing and prune_tiles:
        fast_cover = broadcast_cover_cells(
            zones.sparkSession, geoms_bc.value, meta,
            max_cells_per_zone=max_cells_per_zone,
            raise_beyond_extent=not boundless,
        )
    if fast_cover is None:
        cells = zone_cover_cells(
            zones, meta, clip_to_grid=not need_missing,
            max_cells_per_zone=max_cells_per_zone,
            raise_beyond_extent=not boundless,
            with_geometry=not broadcast_zones,
            null_wkb_keys=big_keys,
        )

    tile_side = tiles.select(
        "dataset", "tile_col", "tile_row", "bytes", "fmt"
    )
    keys = ["dataset", "tile_col", "tile_row"]
    if fast_cover is not None:
        joined = None
    elif need_missing and broadcast_zones:
        # J4 without shuffling tiles: Spark cannot broadcast the LEFT side
        # of a left join, so a plain cells⟕tiles would fall to SMJ and
        # shuffle the payload-bearing tile corpus. Instead: inner broadcast
        # join for the present pairs, plus a key-only second tile scan
        # (column-pruned — no payload bytes read) to find cells with NO
        # stored tile; those rows get a NULL payload and synthesize their
        # boundless nodata fill from the cover mask alone (decoded=None path
        # in the partial kernel). Mirrors the point operator's
        # inner-broadcast + reinstatement plan (operators/point.py:140-148).
        present = F.broadcast(cells).join(tile_side, keys, "inner")
        present_keys = F.broadcast(cells).join(
            tiles.select(*keys), keys, "inner"
        )
        missing = (
            cells.join(F.broadcast(present_keys), ["zone_id", *keys], "left_anti")
            .withColumn("bytes", F.lit(None).cast("binary"))
            .withColumn("fmt", F.lit(None).cast("string"))
        )
        joined = present.unionByName(missing)
    elif not broadcast_zones:
        # SMJ regime (zone set too large to broadcast): the cover cells
        # are GROUPED per tile key before the join — the same exchange
        # the join needs anyway now carries one aggregation, and the join
        # emits ONE row per tile with the covering zones as an array
        # instead of one payload-bearing row per (zone, tile) pair. The
        # tile payload then crosses the Python boundary once per tile,
        # not once per covering zone (3.7× fewer Arrow bytes on the bench
        # corpus, pairs/tiles× in general); the tile side is still never
        # re-shuffled beyond what the join itself requires. Absent tiles
        # arrive as NULL payloads directly via the left join (J4).
        grouped_cells = cells.groupBy(*keys).agg(
            F.collect_list(F.struct("zone_id", "geometry_wkb")).alias("zs")
        )
        joined = grouped_cells.join(
            tile_side, keys, "left" if need_missing else "inner"
        )
    else:
        joined = F.broadcast(cells).join(tile_side, keys, "inner")

    refd = [dataset] if dataset is not None else list(meta)
    # compact only when values are guaranteed float32-representable: raw
    # float32 pixels, no user transform (zone_func output is float64)
    compact = (
        (want_holistic or want_vc)
        and holistic_mode != "exploded"  # exploding needs real arrays
        and zone_func is None
        and all(meta[d].get("dtype") == "float32" for d in refd)
    )
    kernel_kw = dict(
        all_touched=all_touched,
        nodata_override=nodata,
        want_counts=want_holistic or want_vc,
        zone_func=zone_func,
        band=band,
        sketch_px=sketch_px if use_sketch else None,
        compact_vc=compact,
        bands=bands,
        geoms=geoms_bc,
        user_partials={n: t[0] for n, t in add_stats.items()},
    )
    if fast_cover is not None:
        partials = partial_kernel_tiles(tiles, meta, fast_cover, **kernel_kw)
    elif not broadcast_zones:
        partials = partial_kernel_grouped(joined, meta, **kernel_kw)
    else:
        partials = partial_kernel(joined, meta, **kernel_kw)
    group_keys = ("zone_id",) if bands is None else ("zone_id", "band")

    # join-back (J2): per-zone aggregates are ≤1 row/zone — same cardinality
    # class as the broadcastable zone side, so broadcast them and keep the
    # whole plan SMJ-free in the broadcast regime
    _bc = F.broadcast if broadcast_zones else (lambda d: d)
    if (want_holistic or want_vc) and holistic_mode == "exploded":
        # distributed exact holistic: JVM (zone, value) agg — map-side
        # combine dedups before the shuffle; right for skewed zones over
        # high-duplication rasters (the partial kernel is evaluated twice
        # here — decode+rasterize cost is bought back many times over by
        # the distributed domain merge on such corpora)
        scalars = partials.groupBy(*group_keys).agg(
            F.sum("count").alias("count"),
            F.sum("sum").alias("sum"),
            F.sum("sum_i").alias("sum_i"),
            F.sum("sumsq").alias("sumsq"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("nodata_count").alias("nodata_count"),
            F.sum("nan_count").alias("nan_count"),
        )
        hol = exploded_holistic(partials, pctiles, want_vc, keys=group_keys)
        result = (
            _band_base(zones, bands)
            .join(_bc(scalars), list(group_keys), "left")
            .join(_bc(hol), list(group_keys), "left")
        )
    elif want_holistic or want_vc or add_stats:
        # ONE zone-keyed merge for scalars + holistics (+ user states): the
        # partial kernel (decode + rasterize) is evaluated exactly once,
        # not once per consuming aggregation
        salt = holistic_salt
        recompress = None
        if use_sketch:
            # pre-merge is mandatory in sketch mode: it re-sketches each
            # (zone, salt) group so the final merge sees ≤ salt×8×sketch_px
            # points per zone whatever the corpus size
            salt = salt or 16
            recompress = sketch_px * 8
        merged = merged_stats(
            partials, pctiles, want_vc, salt=salt, recompress_px=recompress,
            keys=group_keys,
            user_merges={n: (t[1], t[2]) for n, t in add_stats.items()},
            vectorized=broadcast_zones,
        )
        result = _band_base(zones, bands).join(
            _bc(merged), list(group_keys), "left"
        )
    else:
        scalars = partials.groupBy(*group_keys).agg(
            F.sum("count").alias("count"),
            F.sum("sum").alias("sum"),
            F.sum("sum_i").alias("sum_i"),
            F.sum("sumsq").alias("sumsq"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("nodata_count").alias("nodata_count"),
            F.sum("nan_count").alias("nan_count"),
        )
        result = _band_base(zones, bands).join(
            _bc(scalars), list(group_keys), "left"
        )

    cnt = F.coalesce(F.col("count"), F.lit(0))
    nonempty = cnt > 0
    # int rasters: the int64-accumulated total (sum_i) feeds sum/mean,
    # matching reference float(masked.sum(dtype='int64')) (main.py:262-267);
    # std keeps the float64 moments (reference masked.std() has no
    # accum_dtype, main.py:268-269)
    total = F.coalesce(F.col("sum_i").cast("double"), F.col("sum"))
    mean = total / cnt
    fmean = F.col("sum") / cnt
    cols = [F.col("zone_id")] + ([F.col("band")] if bands is not None else [])
    for s in stats:
        if s == "count":
            cols.append(cnt.alias("count"))
        elif s == "mean":
            cols.append(F.when(nonempty, mean).alias("mean"))
        elif s == "std":
            # population std from merged moments (A6; ddof=0, main.py:268-269)
            var = F.col("sumsq") / cnt - fmean * fmean
            cols.append(F.when(nonempty, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("std"))
        elif s == "range":
            cols.append(F.when(nonempty, F.col("max") - F.col("min")).alias("range"))
        elif s == "sum":
            cols.append(F.when(nonempty, total).alias("sum"))
        elif s in ("min", "max"):
            cols.append(F.when(nonempty, F.col(s)).alias(s))
        elif s == "nodata":
            cols.append(F.coalesce(F.col("nodata_count"), F.lit(0)).cast("double").alias("nodata"))
        elif s == "nan":
            cols.append(F.coalesce(F.col("nan_count"), F.lit(0)).cast("double").alias("nan"))
        elif s in ("median", "majority", "minority") or s.startswith("percentile_"):
            # backtick-escape: percentile_12.5 contains a dot (valid per
            # reference utils.py:21-30 float percentiles)
            cols.append(F.when(nonempty, F.col(f"`{s}`")).alias(s))
        elif s == "unique":
            cols.append(F.when(nonempty, F.col("unique")).alias("unique"))
    if want_vc:
        cols.append(F.when(nonempty, F.col("value_counts")).alias("value_counts"))
    for uname in add_stats:
        cols.append(F.col(f"u_{uname}").alias(uname))
    return result.select(*cols)
