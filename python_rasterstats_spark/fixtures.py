"""Deterministic synthetic corpus (seed=42) — tiles + zones + oracles.

Analog of the reference's ``tests/data`` fixtures (slope.tif, polygons.shp, …
— see FIXTURES.md) rebuilt as parquet tables in the BASELINE.json
``input_hint`` schema:

    tiles(image_id, bytes, w, h, fmt, caption, phash,
          dataset, tile_col, tile_row, affine[6], nodata, dtype, band_count)

plus ``zones`` (WKB features), ``datasets`` (grid metadata), pixel-level /
cover-level oracle tables for DuckDB differential checks, and frozen golden
outputs produced by the single-node reference-semantics oracle
(kernel.zonal_stats_one / point_query_one).

Zone geometries are constructed on fractional pixel boundaries so headline
counts are exact by design: the ``polygons`` collection covers 75 / 50 pixel
centers (reference golden test_zonal.py:26-28), ``multipolygons`` covers
125 (:104-108), ``multipoints`` 3 (:119-123), the no-overlap collection 0
(:223-228). Everything else is frozen from the oracle at generation time.

Run ``python -m python_rasterstats_spark.fixtures`` to (re)build
``data/zonal_fixtures``; generation asserts all structural goldens.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs as C
from . import geom as G
from . import kernel as K

SEED = 42
TILE = 32

# global grid of the slope family — mirrors slope.tif georeferencing
# (pixel 25.525 m, origin (244300.615, 1000868.788); SURVEY.md §1.1)
PX = 25.52514657450613
X0 = 244300.61494985913
Y0 = 1000868.7876863468
AFF_SLOPE = (PX, 0.0, X0, 0.0, -PX, Y0)
H, W = 78, 84
NODATA = -9999.0

# dataset_mask grid (reference: dataset_mask.tif, different origin)
AFF_DMASK = (PX, 0.0, 243943.26289781605, 0.0, -PX, 1001430.340910986)
DM_H, DM_W = 145, 62


def px2x(colf: float) -> float:
    return X0 + colf * PX


def px2y(rowf: float) -> float:
    return Y0 - rowf * PX


def pxbox(c0, r0, c1, r1) -> dict:
    """Box polygon from fractional pixel coords on the slope grid."""
    return G.box(px2x(c0), px2y(r1), px2x(c1), px2y(r0))


# zone0 footprint on the slope grid: pixel centers cols 10..24, rows 20..24
Z0 = (9.8, 19.8, 24.7, 24.8)  # c0, r0, c1, r1 → 15×5 = 75 centers
Z1 = (39.8, 29.8, 49.7, 34.8)  # 10×5 = 50 centers


# ---------------------------------------------------------------------------
# raster field construction
# ---------------------------------------------------------------------------


def _smooth_field(h, w, rng) -> np.ndarray:
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    base = 2.0 + 28.0 * (c / max(w - 1, 1)) + 6.0 * np.sin(r / 9.0)
    noise = rng.normal(0.0, 1.0, size=(h, w))
    return np.clip(base + 1.5 * noise, 0.1, None).astype(np.float64)


def _zone_center_mask(px_bounds, shape, aff) -> np.ndarray:
    c0, r0, c1, r1 = px_bounds
    poly = pxbox(c0, r0, c1, r1)
    pg = K.geom_to_pixel(poly, aff)
    win = ((0, shape[0]), (0, shape[1]))
    return K.rasterize_pixgeom(pg, win)


def build_arrays() -> dict:
    """All fixture rasters: name → (array float32, affine, nodata, fmt)."""
    rng = np.random.default_rng(SEED)
    slope = _smooth_field(H, W, rng)

    # calibrate: mean over zone0's 75 covered pixels == 14.66 exactly
    # (reference golden test_zonal.py:28)
    m0 = _zone_center_mask(Z0, (H, W), AFF_SLOPE)
    slope *= 14.66 / slope[m0].mean()
    slope = slope.astype(np.float32).astype(np.float64)
    # float32 rounding shifted the mean a hair — nudge multiplicatively once
    slope *= 14.66 / slope[m0].mean()
    slope = slope.astype(np.float32)

    # nodata block in the bottom-left corner (away from the zones)
    slope_full = slope.copy()
    slope[70:78, 0:12] = NODATA

    # classes {1, 2, 5}: col bands, one forced class-1 pixel inside zone1 so
    # zonal_stats(..., nodata=1.0) on zone1 gives count 49 / minority 2.0
    # (structural analog of test_zonal.py:194-204)
    classes = np.where(
        np.arange(W)[None, :] < 30, 1.0, np.where(np.arange(W)[None, :] < 43, 2.0, 5.0)
    ) * np.ones((H, 1))
    classes[32, 41] = 1.0
    classes = classes.astype(np.float32)

    # slope with seeded holes: exactly 36 inside zone0, 19 inside zone1
    # (test_zonal.py:428-435 analog)
    slope_nodata = slope.copy()
    hole_rng = np.random.default_rng(SEED + 1)
    for mask, nholes in ((m0, 36), (_zone_center_mask(Z1, (H, W), AFF_SLOPE), 19)):
        rr, cc = np.nonzero(mask)
        pick = hole_rng.choice(len(rr), size=nholes, replace=False)
        slope_nodata[rr[pick], cc[pick]] = NODATA

    all_nodata = np.full((H, W), NODATA, dtype=np.float32)

    # dataset_mask: valid only over zone0's footprint region (test:207-212)
    dmask = _smooth_field(DM_H, DM_W, np.random.default_rng(SEED + 2)).astype(
        np.float32
    )
    valid = np.zeros((DM_H, DM_W), dtype=bool)
    valid[38:51, 18:45] = True
    dmask[~valid] = NODATA

    nan_tiny = np.array([[np.nan, 12.25], [-999.0, 12.75]], dtype=np.float32)
    nan_counts = np.array(
        [[np.nan, np.nan, np.nan], [0.0, 0.0, 0.0], [1.0, 4.0, 5.0]], dtype=np.float32
    )

    return {
        "slope": (slope, AFF_SLOPE, NODATA, "npy"),
        "slope_full": (slope_full, AFF_SLOPE, NODATA, "npy"),
        "slope_classes": (classes, AFF_SLOPE, NODATA, "npy"),
        "slope_nodata": (slope_nodata, AFF_SLOPE, NODATA, "npy"),
        "all_nodata": (all_nodata, AFF_SLOPE, NODATA, "npy"),
        "dataset_mask": (dmask, AFF_DMASK, NODATA, "npy"),
        "nan_tiny": (nan_tiny, (1.0, 0.0, 0.0, 0.0, -1.0, 2.0), -999.0, "npy"),
        "nan_counts": (nan_counts, (1.0, 0.0, 1.0, 0.0, -1.0, 3.0), 0.0, "npy"),
        # multi-band: band 1 = slope, band 2 = 2×slope (float32-exact) so
        # band-selected stats have a trivial independent oracle
        "slope_bands": (np.stack([slope, slope * 2]), AFF_SLOPE, NODATA, "npy"),
        # payload-roundtrip datasets (lossy fmts; PSNR≥40 dB rule)
        "slope_png": (slope, AFF_SLOPE, NODATA, "png"),
        "slope_qnt8": (slope, AFF_SLOPE, NODATA, "qnt8"),
        # high-cardinality continuous field (256×256, ~99% distinct float32
        # values): the sketch-path fixture — exact (value,count) merging
        # degenerates to one pair per pixel here, exercising
        # holistic_mode='sketch' (kernel.sketch_weighted)
        "slope_hd": (
            _smooth_field(256, 256, np.random.default_rng(SEED + 5)).astype(
                np.float32
            ),
            AFF_SLOPE,
            NODATA,
            "npy",
        ),
    }


def build_audio() -> list[tuple[str, np.ndarray, int]]:
    """Deterministic PCM16 clips (mixed sinusoids + seeded noise): the audio
    leg of the multimodal corpus. Returns (clip_id, int16 samples, rate)."""
    rng = np.random.default_rng(SEED + 9)
    clips = []
    for i in range(24):
        sr = 16000
        n = 16384 + 512 * i
        f0 = 55.0 * (1 + i % 7)
        t = np.arange(n) / sr
        x = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 3 * f0 * t + 0.7)
            + 0.05 * rng.standard_normal(n)
        )
        s16 = np.clip(np.rint(x * 20000), -32768, 32767).astype(np.int16)
        clips.append((f"clip_{i:03d}", s16, sr))
    return clips


# ---------------------------------------------------------------------------
# vector collections
# ---------------------------------------------------------------------------


def _pxline(*pts) -> list:
    return [(px2x(c), px2y(r)) for c, r in pts]


def build_zones() -> list[dict]:
    """All vector features: list of dicts with collection/zone_id/geom/props.

    zone_id is globally unique and preserves input order (FIXTURES.md §2).
    """
    colls: list[tuple[str, list[dict]]] = []

    colls.append(("polygons", [pxbox(*Z0), pxbox(*Z1)]))

    colls.append(
        (
            "points",
            [
                {"type": "Point", "coordinates": [px2x(30.3), px2y(15.6)]},
                {"type": "Point", "coordinates": [px2x(60.7), px2y(45.2)]},
                {"type": "Point", "coordinates": [px2x(70.4), px2y(10.8)]},
            ],
        )
    )

    colls.append(
        (
            "lines",
            [
                {
                    "type": "LineString",
                    "coordinates": _pxline((5.3, 10.2), (40.7, 18.9), (60.2, 50.5)),
                },
                {
                    "type": "LineString",
                    "coordinates": _pxline((70.5, 60.2), (75.8, 30.4)),
                },
            ],
        )
    )

    colls.append(
        (
            "multipolygons",
            [
                {
                    "type": "MultiPolygon",
                    "coordinates": [
                        pxbox(4.8, 39.8, 14.7, 49.7)["coordinates"],  # 10×10
                        pxbox(59.8, 9.8, 64.7, 14.7)["coordinates"],  # 5×5
                    ],
                }
            ],
        )
    )

    colls.append(
        (
            "multilines",
            [
                {
                    "type": "MultiLineString",
                    "coordinates": [
                        _pxline((10.4, 55.3), (30.8, 60.7)),
                        _pxline((45.2, 5.4), (52.9, 25.6)),
                    ],
                }
            ],
        )
    )

    colls.append(
        (
            "multipoints",
            [
                {
                    "type": "MultiPoint",
                    "coordinates": [
                        [px2x(20.4), px2y(50.6)],
                        [px2x(33.7), px2y(52.3)],
                        [px2x(47.2), px2y(48.8)],
                    ],
                }
            ],
        )
    )

    colls.append(
        (
            "polygons_partial_overlap",
            [
                pxbox(-3.5 + 0.1 * k, 2.2 + 5 * k, 1.5 + 0.3 * k, 6.6 + 5 * k)
                for k in range(9)
            ],
        )
    )

    colls.append(
        (
            "polygons_no_overlap",
            [pxbox(-25.0, 2.0 + 6 * k, -12.0, 6.0 + 6 * k) for k in range(9)],
        )
    )

    # tiny-raster collections
    colls.append(("nan_tiny_poly", [G.box(0, 0, 2, 2)]))
    colls.append(
        (
            "nan_counts_polys",
            [G.box(1, 0, 4, 3), G.box(1, 2, 4, 3), G.box(3, 0, 4, 1)],
        )
    )

    # point-query probes vs slope (test_point.py analogs)
    colls.append(
        (
            "query_points",
            [
                {"type": "Point", "coordinates": [px2x(30.3), px2y(15.6)]},
                # deep inside the nodata block → None
                {"type": "Point", "coordinates": [px2x(5.5), px2y(74.5)]},
                # straddles the nodata block edge → nearest fallback
                {"type": "Point", "coordinates": [px2x(12.2), px2y(72.4)]},
                # beyond extent → None (boundless masked)
                {"type": "Point", "coordinates": [px2x(-40.0), px2y(-40.0)]},
                {
                    "type": "LineString",
                    "coordinates": _pxline((20.3, 30.6), (25.9, 33.2), (31.4, 30.1)),
                },
            ],
        )
    )

    # large zones on the 256×256 slope_hd grid (~61k / ~13k pixels): big
    # enough that every covering tile partial exceeds the sketch threshold.
    # Appended LAST so earlier collections keep their historical zone_ids.
    colls.append(("hd_zones", [pxbox(2.2, 2.2, 250.4, 251.6),
                               pxbox(40.5, 60.5, 140.5, 190.5)]))

    out = []
    zid = 0
    for coll, geoms in colls:
        for i, g in enumerate(geoms):
            out.append(
                {
                    "collection": coll,
                    "zone_id": zid,
                    "geom": G.normalize_geom(g),
                    "properties": {"id": str(i + 1)},
                }
            )
            zid += 1
    return out


# the query matrix driven through both the Spark engine and the oracles
# name → (collection, dataset, kwargs)
QUERY_MATRIX: dict[str, tuple[str, str, dict]] = {
    "polygons_slope_default": ("polygons", "slope", {}),
    "polygons_slope_all": (
        "polygons",
        "slope",
        {"stats": "*", "percentiles": ["percentile_25", "percentile_90"]},
    ),
    "polygons_slope_touched": ("polygons", "slope", {"all_touched": True}),
    "polygons_classes_categorical": (
        "polygons",
        "slope_classes",
        {"categorical": True, "stats": ["count", "majority", "minority", "unique"]},
    ),
    "polygons_classes_nodata1": (
        "polygons",
        "slope_classes",
        {"nodata": 1.0, "stats": ["count", "minority", "majority"]},
    ),
    "polygons_slope_nodata": (
        "polygons",
        "slope_nodata",
        {"stats": ["count", "nodata", "mean"]},
    ),
    "polygons_all_nodata": (
        "polygons",
        "all_nodata",
        {"stats": ["count", "nodata", "mean"]},
    ),
    "polygons_dataset_mask": ("polygons", "dataset_mask", {"stats": ["count"]}),
    "points_slope": ("points", "slope", {"stats": ["count", "mean"]}),
    "lines_slope": ("lines", "slope", {"stats": ["count", "mean"]}),
    "multipolygons_slope": ("multipolygons", "slope", {"stats": ["count", "mean"]}),
    "multilines_slope": ("multilines", "slope", {"stats": ["count"]}),
    "multipoints_slope": ("multipoints", "slope", {"stats": ["count"]}),
    "partial_overlap_slope": (
        "polygons_partial_overlap",
        "slope",
        {"stats": ["count"]},
    ),
    "no_overlap_slope": ("polygons_no_overlap", "slope", {"stats": ["count"]}),
    "hd_slope_percentiles": (
        "hd_zones",
        "slope_hd",
        {"stats": ["count", "min", "max", "median"],
         "percentiles": ["percentile_25", "percentile_90"]},
    ),
    "nan_tiny": ("nan_tiny_poly", "nan_tiny", {"stats": ["count", "mean", "nan"]}),
    "nan_counts": (
        "nan_counts_polys",
        "nan_counts",
        {"stats": ["count", "nodata", "nan", "sum"]},
    ),
}


def _matrix_stats(kwargs) -> tuple[list[str], bool]:
    stats = kwargs.get("stats")
    categorical = kwargs.get("categorical", False)
    stats, _ = K.check_stats(stats, categorical)
    stats = list(stats) + kwargs.get("percentiles", [])
    return stats, categorical


# ---------------------------------------------------------------------------
# corpus writer
# ---------------------------------------------------------------------------


def _tiles_rows(arrays, tile=TILE):
    for ds, (arr, aff, nodata, fmt) in arrays.items():
        nbands = arr.shape[0] if arr.ndim == 3 else 1
        h, w = arr.shape[-2:]
        ntr = math.ceil(h / tile)
        ntc = math.ceil(w / tile)
        for tr in range(ntr):
            for tc in range(ntc):
                block = arr[..., tr * tile : (tr + 1) * tile,
                            tc * tile : (tc + 1) * tile]
                payload = C.encode_tile(block, fmt)
                image_id = f"{ds}/{tc}_{tr}"
                taff = K.window_affine(
                    ((tr * tile, tr * tile + block.shape[-2]),
                     (tc * tile, tc * tile + block.shape[-1])),
                    aff,
                )
                decoded = C.decode_tile(payload, fmt)
                yield {
                    "image_id": image_id,
                    "bytes": payload,
                    "w": block.shape[-1],
                    "h": block.shape[-2],
                    "fmt": fmt,
                    "caption": f"tile {image_id} of {ds}",
                    "phash": C.phash64(
                        decoded[0] if decoded.ndim == 3 else decoded
                    ),
                    "dataset": ds,
                    "tile_col": tc,
                    "tile_row": tr,
                    "affine": list(taff),
                    "nodata": float(nodata) if nodata is not None else None,
                    "dtype": str(arr.dtype),
                    "band_count": nbands,
                }


def _write(path, pydict, schema, row_group_size=None):
    # small row groups on the tiles table let Spark's parquet scan split one
    # file into many input partitions — at corpus scale the parallelism
    # comes from file count; locally row groups emulate it
    pq.write_table(pa.table(pydict, schema=schema), path,
                   row_group_size=row_group_size)


TILES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("dataset", pa.string()),
        ("tile_col", pa.int32()),
        ("tile_row", pa.int32()),
        ("affine", pa.list_(pa.float64(), 6)),
        ("nodata", pa.float64()),
        ("dtype", pa.string()),
        ("band_count", pa.int32()),
    ]
)

ZONES_SCHEMA = pa.schema(
    [
        ("zone_id", pa.int64()),
        ("collection", pa.string()),
        ("geometry_wkb", pa.binary()),
        ("geom_type", pa.string()),
        ("properties", pa.map_(pa.string(), pa.string())),
    ]
)

DATASETS_SCHEMA = pa.schema(
    [
        ("dataset", pa.string()),
        ("affine", pa.list_(pa.float64(), 6)),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("tile_w", pa.int32()),
        ("tile_h", pa.int32()),
        ("nodata", pa.float64()),
        ("dtype", pa.string()),
        ("fmt", pa.string()),
        ("band_count", pa.int32()),
    ]
)


def write_corpus(outdir: str, arrays=None, zones=None, tile=TILE) -> None:
    os.makedirs(outdir, exist_ok=True)
    arrays = arrays if arrays is not None else build_arrays()
    zones = zones if zones is not None else build_zones()

    rows = list(_tiles_rows(arrays, tile))
    _write(
        os.path.join(outdir, "tiles.parquet"),
        {k.name: [r[k.name] for r in rows] for k in TILES_SCHEMA},
        TILES_SCHEMA,
        row_group_size=32,
    )

    _write(
        os.path.join(outdir, "zones.parquet"),
        {
            "zone_id": [z["zone_id"] for z in zones],
            "collection": [z["collection"] for z in zones],
            "geometry_wkb": [G.wkb_dumps(z["geom"]) for z in zones],
            "geom_type": [z["geom"]["type"] for z in zones],
            "properties": [list(z["properties"].items()) for z in zones],
        },
        ZONES_SCHEMA,
    )

    _write(
        os.path.join(outdir, "datasets.parquet"),
        {
            "dataset": list(arrays),
            "affine": [list(v[1]) for v in arrays.values()],
            "height": [v[0].shape[-2] for v in arrays.values()],
            "width": [v[0].shape[-1] for v in arrays.values()],
            "tile_w": [tile] * len(arrays),
            "tile_h": [tile] * len(arrays),
            "nodata": [float(v[2]) if v[2] is not None else None for v in arrays.values()],
            "dtype": [str(v[0].dtype) for v in arrays.values()],
            "fmt": [v[3] for v in arrays.values()],
            "band_count": [
                v[0].shape[0] if v[0].ndim == 3 else 1 for v in arrays.values()
            ],
        },
        DATASETS_SCHEMA,
    )


def write_oracles(outdir: str, arrays=None, zones=None) -> dict:
    """Pixel/cover oracle tables + frozen golden outputs.

    The cover table shares the rasterize kernel with the engine (there is no
    independent GDAL here), so the DuckDB comparison is a differential test
    of the *distributed plumbing* — join, partials, merge — against
    single-node numpy; rasterize itself is unit-tested separately.
    """
    arrays = arrays if arrays is not None else build_arrays()
    zones = zones if zones is not None else build_zones()
    by_coll: dict[str, list] = {}
    for z in zones:
        by_coll.setdefault(z["collection"], []).append(z)

    # pixels
    pix = {k: [] for k in ("dataset", "prow", "pcol", "value", "is_nodata", "is_nan")}
    for ds, (arr, aff, nodata, fmt) in arrays.items():
        if fmt != "npy" or arr.ndim == 3:
            continue  # lossy payloads / multiband: covered by band queries
        h, w = arr.shape
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        vals = arr.astype(np.float64).ravel()
        pix["dataset"] += [ds] * vals.size
        pix["prow"] += rr.ravel().tolist()
        pix["pcol"] += cc.ravel().tolist()
        pix["value"] += vals.tolist()
        pix["is_nodata"] += (vals == nodata).tolist() if nodata is not None else [False] * vals.size
        pix["is_nan"] += np.isnan(vals).tolist()
    pix_schema = pa.schema(
        [
            ("dataset", pa.string()),
            ("prow", pa.int32()),
            ("pcol", pa.int32()),
            ("value", pa.float64()),
            ("is_nodata", pa.bool_()),
            ("is_nan", pa.bool_()),
        ]
    )
    _write(os.path.join(outdir, "oracle_pixels.parquet"), pix, pix_schema)

    # cover cells per query (boxified points, bbox window, rasterize)
    cov = {k: [] for k in ("query", "zone_id", "dataset", "prow", "pcol")}
    golden_rows = []
    for qname, (coll, ds, kwargs) in QUERY_MATRIX.items():
        arr, aff, ds_nodata, _ = arrays[ds]
        nodata = kwargs.get("nodata", ds_nodata)
        all_touched = kwargs.get("all_touched", False)
        stats, categorical = _matrix_stats(kwargs)
        for z in by_coll[coll]:
            geom = z["geom"]
            gb = K.boxify_points(geom, aff) if "Point" in geom["type"] else geom
            win = K.bounds_window(G.geom_bounds(gb), aff)
            rv = K.rasterize_pixgeom(
                K.geom_to_pixel(gb, aff), win, all_touched=all_touched
            )
            rr, cc = np.nonzero(rv)
            n = len(rr)
            cov["query"] += [qname] * n
            cov["zone_id"] += [z["zone_id"]] * n
            cov["dataset"] += [ds] * n
            cov["prow"] += (rr + win[0][0]).tolist()
            cov["pcol"] += (cc + win[1][0]).tolist()

            out = K.zonal_stats_one(
                geom,
                arr,
                aff,
                nodata=nodata,
                stats=[s for s in stats if not s.startswith("percentile_")],
                all_touched=all_touched,
                categorical=categorical,
            )
            for s in stats:
                if s.startswith("percentile_"):
                    full = K.zonal_stats_one(
                        geom, arr, aff, nodata=nodata, stats=[s],
                        all_touched=all_touched,
                    )
                    out[s] = full[s]
            golden_rows.append(
                {"query": qname, "zone_id": z["zone_id"], "out": out,
                 "categorical": categorical}
            )
    cov_schema = pa.schema(
        [
            ("query", pa.string()),
            ("zone_id", pa.int64()),
            ("dataset", pa.string()),
            ("prow", pa.int32()),
            ("pcol", pa.int32()),
        ]
    )
    _write(os.path.join(outdir, "oracle_cover.parquet"), cov, cov_schema)

    # frozen golden zonal outputs (expected_zonal)
    stat_cols = [
        "count", "min", "max", "mean", "sum", "std", "median", "majority",
        "minority", "unique", "range", "nodata", "nan",
        "percentile_25", "percentile_90",
    ]
    gz = {"query": [], "zone_id": [], "value_counts": []}
    for scol in stat_cols:
        gz[scol] = []
    for row in golden_rows:
        gz["query"].append(row["query"])
        gz["zone_id"].append(row["zone_id"])
        out = row["out"]
        for scol in stat_cols:
            v = out.get(scol)
            gz[scol].append(None if v is None else float(v))
        if row["categorical"]:
            vc = {
                k: int(v)
                for k, v in out.items()
                if isinstance(k, float)
            }
            gz["value_counts"].append(list(vc.items()))
        else:
            gz["value_counts"].append(None)
    gz_schema = pa.schema(
        [("query", pa.string()), ("zone_id", pa.int64())]
        + [(s, pa.float64()) for s in stat_cols]
        + [("value_counts", pa.map_(pa.float64(), pa.int64()))]
    )
    _write(os.path.join(outdir, "expected_zonal.parquet"), gz, gz_schema)

    # point-query goldens (+ the vertex table the SQL oracle consumes)
    qv = {k: [] for k in ("zone_id", "vertex_idx", "x", "y")}
    ep = {k: [] for k in ("zone_id", "vertex_idx", "interpolate", "value")}
    slope_arr, slope_aff, slope_nd, _ = arrays["slope"]
    for z in by_coll["query_points"]:
        verts = list(G.geom_vertices(z["geom"]))
        for vi, (x, y) in enumerate(verts):
            qv["zone_id"].append(z["zone_id"])
            qv["vertex_idx"].append(vi)
            qv["x"].append(x)
            qv["y"].append(y)
        for interp in ("bilinear", "nearest"):
            vals = K.point_query_one(
                z["geom"], slope_arr, slope_aff, nodata=slope_nd, interpolate=interp
            )
            if not isinstance(vals, list):
                vals = [vals]
            for vi, v in enumerate(vals):
                ep["zone_id"].append(z["zone_id"])
                ep["vertex_idx"].append(vi)
                ep["interpolate"].append(interp)
                ep["value"].append(None if v is None else float(v))
    _write(
        os.path.join(outdir, "query_vertices.parquet"),
        qv,
        pa.schema(
            [("zone_id", pa.int64()), ("vertex_idx", pa.int32()),
             ("x", pa.float64()), ("y", pa.float64())]
        ),
    )
    # per-tile decoded-pixel stats (multimodal decode oracle): computed from
    # the DECODED payload so lossy fmts compare exactly against the engine
    ts = {k: [] for k in ("image_id", "dataset", "w", "h", "mean_r", "min_r",
                          "max_r", "valid_cnt", "phash_check")}
    for row in _tiles_rows(arrays):
        arr = np.asarray(C.decode_tile(row["bytes"], row["fmt"]), dtype=np.float64)
        if arr.ndim == 3:
            arr = arr[0]
        valid = np.isfinite(arr)
        if row["nodata"] is not None:
            valid &= arr != row["nodata"]
        vals = arr[valid]
        ts["image_id"].append(row["image_id"])
        ts["dataset"].append(row["dataset"])
        ts["h"].append(arr.shape[0])
        ts["w"].append(arr.shape[1])
        ts["mean_r"].append(round(float(vals.mean()), 6) if vals.size else None)
        ts["min_r"].append(round(float(vals.min()), 6) if vals.size else None)
        ts["max_r"].append(round(float(vals.max()), 6) if vals.size else None)
        ts["valid_cnt"].append(int(vals.size))
        ts["phash_check"].append(C.phash64(arr))
    _write(
        os.path.join(outdir, "oracle_tile_stats.parquet"),
        ts,
        pa.schema(
            [("image_id", pa.string()), ("dataset", pa.string()),
             ("w", pa.int32()), ("h", pa.int32()), ("mean_r", pa.float64()),
             ("min_r", pa.float64()), ("max_r", pa.float64()),
             ("valid_cnt", pa.int64()), ("phash_check", pa.int64())]
        ),
    )

    _write(
        os.path.join(outdir, "expected_point.parquet"),
        ep,
        pa.schema(
            [("zone_id", pa.int64()), ("vertex_idx", pa.int32()),
             ("interpolate", pa.string()), ("value", pa.float64())]
        ),
    )

    # audio corpus + windowed-feature goldens (multimodal audio leg):
    # oracle computed from the RAW waveform arrays, independent of the
    # pcm16 payload decode the operator exercises
    clips = build_audio()
    au = {k: [] for k in ("clip_id", "bytes", "sample_rate", "n_samples",
                          "caption")}
    for cid, s16, sr in clips:
        au["clip_id"].append(cid)
        au["bytes"].append(C.pcm16_encode(s16, sr))
        au["sample_rate"].append(sr)
        au["n_samples"].append(int(s16.size))
        au["caption"].append(f"synthetic clip {cid}")
    _write(
        os.path.join(outdir, "audio.parquet"),
        au,
        pa.schema([("clip_id", pa.string()), ("bytes", pa.binary()),
                   ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
                   ("caption", pa.string())]),
    )
    WIN = 1024
    aw = {k: [] for k in ("clip_id", "win_idx", "rms_r", "peak", "zc_cnt")}
    for cid, s16, _sr in clips:
        nwin = s16.size // WIN
        w = s16[: nwin * WIN].reshape(nwin, WIN)
        f = w.astype(np.float64) / 32768.0
        rms = np.sqrt((f * f).mean(axis=1))
        peak = np.abs(w.astype(np.int64)).max(axis=1)
        sb = w < 0
        zc = (sb[:, 1:] != sb[:, :-1]).sum(axis=1)
        aw["clip_id"] += [cid] * nwin
        aw["win_idx"] += list(range(nwin))
        aw["rms_r"] += np.round(rms, 6).tolist()
        aw["peak"] += peak.tolist()
        aw["zc_cnt"] += zc.astype(np.int64).tolist()
    _write(
        os.path.join(outdir, "oracle_audio_windows.parquet"),
        aw,
        pa.schema([("clip_id", pa.string()), ("win_idx", pa.int32()),
                   ("rms_r", pa.float64()), ("peak", pa.int64()),
                   ("zc_cnt", pa.int64())]),
    )

    # mini-raster goldens (A20, reference main.py:318-328): prepare_zone on
    # the full in-memory array — an execution path independent of the
    # gather operator's tile mosaic — digested for the raster_out gate
    import hashlib

    ro = {k: [] for k in ("zone_id", "data_md5", "mask_md5",
                          "aff_a", "aff_b", "aff_c", "aff_d", "aff_e",
                          "aff_f", "nodata")}
    s_arr, s_aff, s_nd, _ = arrays["slope"]
    for z in by_coll["polygons"]:
        block, rv, win, fill = K.prepare_zone(z["geom"], s_arr, s_aff,
                                              nodata=s_nd)
        isnan = np.isnan(block)
        masked = np.ma.MaskedArray(
            block, mask=((block == fill) | isnan | ~rv)
        )
        data = np.ma.filled(masked, fill).astype(np.float32)
        mask = np.ma.getmaskarray(masked)
        taff = K.window_affine(win, s_aff)
        ro["zone_id"].append(z["zone_id"])
        ro["data_md5"].append(hashlib.md5(C.encode_tile(data, "npy")).hexdigest())
        ro["mask_md5"].append(hashlib.md5(C.encode_tile(mask, "npy")).hexdigest())
        for name, v in zip(("aff_a", "aff_b", "aff_c", "aff_d", "aff_e",
                            "aff_f"), taff):
            ro[name].append(round(float(v), 6))
        ro["nodata"].append(float(fill))
    _write(
        os.path.join(outdir, "oracle_raster_out.parquet"),
        ro,
        pa.schema(
            [("zone_id", pa.int64()), ("data_md5", pa.string()),
             ("mask_md5", pa.string())]
            + [(f"aff_{c}", pa.float64()) for c in "abcdef"]
            + [("nodata", pa.float64())]
        ),
    )
    return {r["query"]: r for r in golden_rows}


# ---------------------------------------------------------------------------
# structural golden assertions (FIXTURES.md §3) — run at generation time
# ---------------------------------------------------------------------------


def check_structural(arrays, zones) -> None:
    by_coll: dict[str, list] = {}
    for z in zones:
        by_coll.setdefault(z["collection"], []).append(z)
    slope, aff, nd, _ = arrays["slope"]

    def zs(coll, ds="slope", **kw):
        arr, aff_, ndd, _ = arrays[ds]
        kw.setdefault("nodata", ndd)
        return [
            K.zonal_stats_one(z["geom"], arr, aff_, **kw) for z in by_coll[coll]
        ]

    out = zs("polygons")
    assert [o["count"] for o in out] == [75, 50], out
    assert round(out[0]["mean"], 2) == 14.66, out[0]["mean"]

    touched = zs("polygons", all_touched=True)
    assert all(t["count"] > o["count"] for t, o in zip(touched, out))

    cat = zs("polygons", ds="slope_classes", categorical=True, stats=["count"])
    assert {k for k in cat[0] if isinstance(k, float)} == {1.0}
    assert cat[0][1.0] == 75
    assert 5.0 in cat[1]

    nd1 = zs("polygons", ds="slope_classes", nodata=1.0,
             stats=["count", "minority", "majority"])
    assert nd1[0]["count"] == 0 and nd1[0]["minority"] is None
    assert nd1[1]["count"] == 49 and nd1[1]["minority"] == 2.0

    sn = zs("polygons", ds="slope_nodata", stats=["count", "nodata"])
    assert [o["nodata"] for o in sn] == [36.0, 19.0], sn
    assert [o["count"] for o in sn] == [39, 31], sn

    an = zs("polygons", ds="all_nodata", stats=["count", "nodata"])
    assert [o["count"] for o in an] == [0, 0]
    assert [o["nodata"] for o in an] == [75.0, 50.0]

    dm = zs("polygons", ds="dataset_mask", stats=["count"])
    assert dm[0]["count"] > 0 and dm[1]["count"] == 0, dm

    pts = zs("points", stats=["count", "mean"])
    assert sum(o["count"] for o in pts) == 3

    lns = zs("lines", stats=["count"])
    assert all(o["count"] > 0 for o in lns)

    assert zs("multipolygons", stats=["count"])[0]["count"] == 125
    assert zs("multilines", stats=["count"])[0]["count"] > 0
    assert zs("multipoints", stats=["count"])[0]["count"] == 3
    assert all(o["count"] > 0 for o in zs("polygons_partial_overlap", stats=["count"]))
    assert all(o["count"] == 0 for o in zs("polygons_no_overlap", stats=["count"]))

    # percentile_50 == median (test_zonal.py:340-346)
    p50 = zs("polygons", stats=["median", "percentile_50"])
    assert all(o["median"] == o["percentile_50"] for o in p50)

    # point-query structural goldens
    q = by_coll["query_points"]
    v0 = K.point_query_one(q[0]["geom"], slope, aff, nodata=nd)
    assert v0 is not None and v0 > 0
    assert K.point_query_one(q[1]["geom"], slope, aff, nodata=nd) is None
    v2b = K.point_query_one(q[2]["geom"], slope, aff, nodata=nd)
    v2n = K.point_query_one(q[2]["geom"], slope, aff, nodata=nd, interpolate="nearest")
    assert v2b == v2n and v2b is not None  # nearest fallback engaged
    assert K.point_query_one(q[3]["geom"], slope, aff, nodata=nd) is None
    vline = K.point_query_one(q[4]["geom"], slope, aff, nodata=nd)
    assert isinstance(vline, list) and len(vline) == 3


FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data",
                           "zonal_fixtures")

# ---------------------------------------------------------------------------
# SF-scaled bench corpus (FIXTURES.md §5): big tile grid + heavy-tail zones
# ---------------------------------------------------------------------------

BENCH_SIZES = {
    # sf name → (tiles per side, tile px, small zones, continents)
    "sf0.001": (8, 64, 100, 2),
    "sf0.01": (16, 128, 400, 4),
    "sf0.1": (48, 128, 2000, 8),
    # scaling-evidence corpus: big enough that the zonal job is
    # compute-dominated (≫ scheduler/worker-startup overhead) at 8 cores
    "scaling": (96, 256, 8000, 24),
    "sf1": (96, 256, 8000, 12),
}


def build_bench_corpus(outdir: str, sf_name: str = "sf0.1", seed: int = SEED) -> dict:
    """Deterministic bench corpus: one big raster of n×n tiles plus a mixed
    zone population — many small boxes + a heavy tail of continent-sized
    polygons covering ~25% of the grid each (exercises fan-out/skew).

    Returns meta: pair counts etc. (also written to bench_meta.json).
    """
    import json

    nts, tpx, n_small, n_cont = BENCH_SIZES[sf_name]
    h = w = nts * tpx
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    rng = np.random.default_rng(seed)

    r = np.arange(h, dtype=np.float64)[:, None]
    c = np.arange(w, dtype=np.float64)[None, :]
    arr = (10.0 + 0.002 * c + 0.001 * r + 4.0 * np.sin(c / 97.0)).astype(np.float32)
    arr[: h // 50, :] = NODATA  # thin nodata band

    def pxy(col, row):  # pixel → CRS on this grid
        return (float(col), float(h - row))

    zones = []
    zid = 0

    def add_box(c0, r0, c1, r1, coll):
        nonlocal zid
        x0, y1 = pxy(c0, r0)
        x1, y0 = pxy(c1, r1)
        zones.append(
            {
                "collection": coll,
                "zone_id": zid,
                "geom": G.box(x0, y0, x1, y1),
                "properties": {"id": str(zid + 1)},
            }
        )
        zid += 1

    for _ in range(n_small):
        c0 = rng.uniform(0, w - 2 * tpx)
        r0 = rng.uniform(0, h - 2 * tpx)
        add_box(c0, r0, c0 + rng.uniform(0.3, 1.6) * tpx,
                r0 + rng.uniform(0.3, 1.6) * tpx, "small")

    side = 0.25 * w
    for _ in range(n_cont):
        cx = rng.uniform(side / 2, w - side / 2)
        cy = rng.uniform(side / 2, h - side / 2)
        # octagon ≈ continent (non-rectangular edges exercise scanline fill)
        angles = np.linspace(0, 2 * np.pi, 9)[:-1] + rng.uniform(0, 0.3)
        radii = side / 2 * rng.uniform(0.7, 1.0, size=8)
        ring = [
            pxy(cx + rad * np.cos(a), cy + rad * np.sin(a))
            for a, rad in zip(angles, radii)
        ]
        ring.append(ring[0])
        zones.append(
            {
                "collection": "continent",
                "zone_id": zid,
                "geom": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"id": str(zid + 1)},
            }
        )
        zid += 1

    arrays = {"bench": (arr, aff, NODATA, "npy")}
    write_corpus(outdir, arrays, zones, tile=tpx)

    # exact (zone, tile) pair count for throughput accounting
    n_pairs = 0
    for z in zones:
        (r0_, r1_), (c0_, c1_) = K.bounds_window(G.geom_bounds(z["geom"]), aff)
        tr0, tr1 = max(r0_ // tpx, 0), min((r1_ - 1) // tpx, nts - 1)
        tc0, tc1 = max(c0_ // tpx, 0), min((c1_ - 1) // tpx, nts - 1)
        n_pairs += max(tr1 - tr0 + 1, 0) * max(tc1 - tc0 + 1, 0)
    meta = {
        "sf": sf_name,
        "tiles": nts * nts,
        "tile_px": tpx,
        "zones": len(zones),
        "pairs": int(n_pairs),
        "pixels": int(h) * int(w),
    }
    with open(os.path.join(outdir, "bench_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ensure_bench_corpus(sf_name: str = "sf0.1") -> tuple[str, dict]:
    import json

    outdir = os.path.join(os.path.dirname(FIXTURE_DIR), f"bench_{sf_name}")
    marker = os.path.join(outdir, "bench_meta.json")
    if not os.path.exists(marker):
        meta = build_bench_corpus(outdir, sf_name)
    else:
        with open(marker) as f:
            meta = json.load(f)
    return outdir, meta


def ensure_fixtures(outdir: str = FIXTURE_DIR) -> str:
    """Generate the fixture corpus if missing; return the directory."""
    marker = os.path.join(outdir, "expected_point.parquet")
    if not os.path.exists(marker):
        arrays = build_arrays()
        zones = build_zones()
        check_structural(arrays, zones)
        write_corpus(outdir, arrays, zones)
        write_oracles(outdir, arrays, zones)
    return outdir


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else FIXTURE_DIR
    arrays = build_arrays()
    zones = build_zones()
    check_structural(arrays, zones)
    write_corpus(out, arrays, zones)
    write_oracles(out, arrays, zones)
    print(f"fixtures written to {out}")
