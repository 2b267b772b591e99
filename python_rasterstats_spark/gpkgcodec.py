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


def write_geopackage(path: str, layers: dict) -> None:
    """Write ``{layer_name: [feature dict, ...]}`` as a minimal OGC
    GeoPackage (the sink twin of read_geopackage): gpkg_contents +
    gpkg_geometry_columns + one feature table per layer, geometries as
    GeoPackageBinary (GP header, LE, xy envelope) wrapping the engine's
    own WKB; properties land as TEXT columns (union of keys, stringified
    — enough for fixture/bench interchange, not a typed attribute
    store)."""
    import struct

    con = sqlite3.connect(path)
    try:
        # OGC requirements 2/3: the GeoPackage magic in application_id
        # ('GPKG') + a 1.2 user_version, and a gpkg_spatial_ref_sys table
        # with the mandatory srs rows — without these, OGR/fiona-based
        # readers reject the file outright
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10200")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        con.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
                 "undefined cartesian coordinate reference system"),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
                 "undefined geographic coordinate reference system"),
                ("WGS 84 geodetic", 4326, "EPSG", 4326,
                 'GEOGCS["WGS 84",DATUM["WGS_1984",'
                 'SPHEROID["WGS 84",6378137,298.257223563]],'
                 'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
                 "longitude/latitude coordinates in decimal degrees"),
            ],
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT PRIMARY KEY, data_type TEXT, "
            "identifier TEXT, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT, column_name TEXT, geometry_type_name TEXT, "
            "srs_id INTEGER, z TINYINT, m TINYINT)"
        )
        for name, feats in layers.items():
            keys = sorted({
                k for f in feats for k in (f.get("properties") or {})
            })
            cols = ", ".join(f'"{k}" TEXT' for k in keys)
            con.execute(
                f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY, '
                f"geom BLOB{', ' + cols if cols else ''})"
            )
            con.execute(
                "INSERT INTO gpkg_contents VALUES (?, 'features', ?, 0)",
                (name, name),
            )
            con.execute(
                "INSERT INTO gpkg_geometry_columns VALUES "
                "(?, 'geom', 'GEOMETRY', 0, 0, 0)",
                (name,),
            )
            for i, f in enumerate(feats):
                gmap = f["geometry"] if f.get("type") == "Feature" else f
                wkb = G.wkb_dumps(gmap)
                x0, y0, x1, y1 = G.geom_bounds(gmap)
                blob = (
                    b"GP\x00" + bytes([0b00000011])
                    + struct.pack("<i", 0)
                    + struct.pack("<4d", x0, x1, y0, y1) + wkb
                )
                props = f.get("properties") or {}
                vals = [
                    None if props.get(k) is None else str(props[k])
                    for k in keys
                ]
                ph = ", ".join("?" for _ in range(2 + len(keys)))
                con.execute(
                    f'INSERT INTO "{name}" VALUES ({ph})',
                    (i + 1, blob, *vals),
                )
        con.commit()
    finally:
        con.close()


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
