"""Adversarial edge cases: exact center/boundary alignments, degenerate
geometries, 1-pixel zones, grid-edge straddles — determinism and seam
invariance where floating point is least forgiving."""

import numpy as np
import pytest

from python_rasterstats_spark import geom as G
from python_rasterstats_spark import kernel as K

EYE = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)  # identity: pixel space == CRS


def _split_consistent(pgeom, win, all_touched=False):
    full = K.rasterize_pixgeom(pgeom, win, all_touched=all_touched)
    (r0, r1), (c0, c1) = win
    rm = (r0 + r1) // 2
    cm = (c0 + c1) // 2
    parts = np.zeros_like(full)
    for rs, re_ in ((r0, rm), (rm, r1)):
        for cs, ce in ((c0, cm), (cm, c1)):
            parts[rs - r0 : re_ - r0, cs - c0 : ce - c0] = K.rasterize_pixgeom(
                pgeom, ((rs, re_), (cs, ce)), all_touched=all_touched
            )
    assert (full == parts).all()
    return full


def test_vertices_on_cell_centers():
    """Polygon whose vertices sit exactly on pixel centers: deterministic,
    seam-invariant, sane count."""
    poly = {
        "type": "Polygon",
        "coordinates": [[(2.5, 2.5), (9.5, 2.5), (9.5, 9.5), (2.5, 9.5), (2.5, 2.5)]],
    }
    pg = K.geom_to_pixel(poly, EYE)
    full = _split_consistent(pg, ((0, 12), (0, 12)))
    # interior centers strictly inside: rows/cols 3..8 always burn; the
    # boundary rows follow the half-open scanline rule deterministically
    assert full[3:9, 3:9].all()
    assert 36 <= full.sum() <= 64


def test_edges_on_cell_boundaries():
    """Box aligned exactly to cell boundaries burns exactly its cells."""
    poly = G.box(2.0, 3.0, 7.0, 9.0)
    pg = K.geom_to_pixel(poly, EYE)
    full = _split_consistent(pg, ((0, 12), (0, 12)))
    assert full.sum() == 5 * 6
    assert full[3:9, 2:7].all()


def test_single_pixel_and_degenerate():
    tiny = G.box(4.2, 4.2, 4.8, 4.8)  # inside one cell, covers its center
    pg = K.geom_to_pixel(tiny, EYE)
    rv = K.rasterize_pixgeom(pg, ((0, 10), (0, 10)))
    assert rv.sum() == 1 and rv[4, 4]
    sliver = G.box(4.6, 4.6, 4.9, 4.9)  # covers no center
    rv = K.rasterize_pixgeom(K.geom_to_pixel(sliver, EYE), ((0, 10), (0, 10)))
    assert rv.sum() == 0
    # all_touched picks the sliver up
    rv = K.rasterize_pixgeom(
        K.geom_to_pixel(sliver, EYE), ((0, 10), (0, 10)), all_touched=True
    )
    assert rv.sum() >= 1
    # zero-area (collinear ring) → no fill, no crash
    flat = {
        "type": "Polygon",
        "coordinates": [[(1.0, 1.0), (5.0, 1.0), (3.0, 1.0), (1.0, 1.0)]],
    }
    rv = K.rasterize_pixgeom(K.geom_to_pixel(flat, EYE), ((0, 10), (0, 10)))
    assert rv.sum() == 0


def test_zone_straddling_grid_edge_stats():
    """Zonal stats for a zone half off the raster: valid pixels from the
    inside part only; nodata counts the boundless fill."""
    arr = np.full((6, 6), 5.0, dtype=np.float32)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 6.0)
    half_off = G.box(-3.2, 1.2, 2.8, 4.8)  # cols -4..2, rows 1..4 centers
    out = K.zonal_stats_one(
        half_off, arr, aff, nodata=-1.0, stats=["count", "nodata", "sum"]
    )
    assert out["count"] > 0
    assert out["nodata"] > 0  # boundless fill inside the geometry
    assert out["sum"] == 5.0 * out["count"]


def test_spark_center_aligned_zone(spark):
    """A center/boundary-aligned zone through the distributed path equals
    the oracle (the fp-riskiest alignment)."""
    from python_rasterstats_spark.operators.zonal import zonal_stats_df
    from python_rasterstats_spark.sources.tables import (
        ZONES_DDL, raster_to_tables,
    )

    rng = np.random.default_rng(99)
    arr = rng.uniform(0, 10, size=(40, 40)).astype(np.float32)
    aff = (1.0, 0.0, 0.0, 0.0, -1.0, 40.0)
    tiles, datasets = raster_to_tables(
        spark, arr, aff, dataset="edge", nodata=-1.0, tile=16
    )
    geoms = [
        G.box(8.0, 8.0, 24.0, 24.0),          # boundary-aligned, spans seams
        G.box(15.5, 15.5, 16.5, 16.5),        # centers on the tile seam
        G.box(0.5, 0.5, 39.5, 39.5),          # full-grid, center-aligned
    ]
    zdf = spark.createDataFrame(
        [
            {"zone_id": i, "collection": "e", "geometry_wkb": G.wkb_dumps(g),
             "geom_type": "Polygon", "properties": {}}
            for i, g in enumerate(geoms)
        ],
        schema=ZONES_DDL,
    )
    got = {
        r["zone_id"]: r.asDict()
        for r in zonal_stats_df(
            zdf, tiles, datasets, dataset="edge",
            stats=["count", "sum", "median"],
        ).collect()
    }
    for i, g in enumerate(geoms):
        want = K.zonal_stats_one(
            g, arr, aff, nodata=-1.0, stats=["count", "sum", "median"]
        )
        assert got[i]["count"] == want["count"], i
        assert got[i]["sum"] == pytest.approx(want["sum"], rel=1e-12)
        assert got[i]["median"] == want["median"]
