"""Minimal from-scratch GeoPackage (OGC 12-128r19) feature reader —
stdlib sqlite3 + the engine's own WKB parser, no GDAL.

A GeoPackage is a SQLite database: ``gpkg_contents`` lists the feature
tables, ``gpkg_geometry_columns`` names each table's geometry column,
and each geometry value is a GeoPackageBinary blob — an 8+ byte header
(magic 'GP', version, flags, srs_id, optional envelope) followed by
STANDARD WKB, which geom.wkb_loads already decodes. This covers the
reference's third vector-path format (rasterstats io.py:94-109 reads
shapefile/GeoJSON/GPKG through fiona); ``layer`` selects a feature
table by index (gpkg_contents order) or by name — the one input form
where the reference's ``layer`` argument is meaningful.
"""

from __future__ import annotations

import sqlite3


from . import geom as G


class GeoPackageError(ValueError):
    pass


# envelope-contents indicator (flags bits 1-3) → number of doubles
_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gpb_to_wkb(blob: bytes) -> bytes | None:
    """GeoPackageBinary → the embedded standard WKB (None for the empty-
    geometry flag)."""
    if len(blob) < 8 or blob[:2] != b"GP":
        raise GeoPackageError("not a GeoPackageBinary blob (bad magic)")
    flags = blob[3]
    if flags & 0b100000:
        raise GeoPackageError("extended GeoPackageBinary is not supported")
    env = (flags >> 1) & 0b111
    ndoubles = _ENV_DOUBLES.get(env)
    if ndoubles is None:
        raise GeoPackageError(f"invalid envelope indicator {env}")
    if flags & 0b10000:  # empty geometry
        return None
    return blob[8 + 8 * ndoubles:]


def list_layers(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            # rowid order = insertion order, matching OGR's layer-index
            # semantics (NOT alphabetical)
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY rowid"
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def read_geopackage(path: str, layer: int | str = 0) -> list[dict]:
    """Feature dicts (GeoJSON-style) from one feature table of ``path``."""
    layers = list_layers(path)
    if not layers:
        raise GeoPackageError(f"{path}: no feature tables in gpkg_contents")
    if isinstance(layer, int):
        if layer >= len(layers):
            raise GeoPackageError(
                f"layer index {layer} out of range (have {layers})"
            )
        name = layers[layer]
    else:
        if layer not in layers:
            raise GeoPackageError(f"layer {layer!r} not found (have {layers})")
        name = layer
    con = sqlite3.connect(path)
    try:
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?",
            (name,),
        ).fetchone()
        if row is None:
            raise GeoPackageError(f"{name}: no gpkg_geometry_columns entry")
        gcol = row[0]
        cur = con.execute(f'SELECT * FROM "{name}"')
        cols = [d[0] for d in cur.description]
        # SQLite identifiers are case-insensitive: match the declared
        # geometry/fid columns the same way
        gi = next(
            (j for j, c in enumerate(cols) if c.lower() == gcol.lower()),
            None,
        )
        if gi is None:
            raise GeoPackageError(f"{name}: geometry column {gcol!r} missing")
        fid_i = next(
            (j for j, c in enumerate(cols) if c.lower() == "fid"), None
        )
        feats = []
        for i, rec in enumerate(cur):
            wkb = gpb_to_wkb(rec[gi]) if rec[gi] is not None else None
            if wkb is None:
                continue
            props = {
                c: v for c, v in zip(cols, rec)
                if c.lower() != gcol.lower() and c.lower() != "fid"
            }
            feats.append(
                {
                    "type": "Feature",
                    "id": str(rec[fid_i] if fid_i is not None else i),
                    "properties": props,
                    "geometry": G.wkb_loads(wkb),
                }
            )
        return feats
    finally:
        con.close()
