"""Pure-python geometry model + codecs (no shapely / GEOS dependency).

Geometries are GeoJSON-like dicts ``{"type": ..., "coordinates": ...}`` with
the six types the reference accepts (reference: io.py:23-30 ``geom_types``).
Z coordinates are flattened to 2D on load (reference: point.py:72-74).

Codecs: WKB (ISO + EWKB Z-flag tolerated on read, 2D little-endian on write),
WKT (read/write), GeoJSON mapping passthrough, ``__geo_interface__``.

This module runs on executors inside Arrow UDF batches, so it only uses
stdlib + numpy.
"""

from __future__ import annotations

import json
import re
import struct
from collections.abc import Iterable, Mapping

GEOM_TYPES = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
)

_WKB_CODE = {name: i + 1 for i, name in enumerate(GEOM_TYPES)}
_WKB_NAME = {v: k for k, v in _WKB_CODE.items()}


# ---------------------------------------------------------------------------
# coordinate helpers
# ---------------------------------------------------------------------------


def _flatten2d(coords):
    """Drop Z (and beyond) from a coordinate tuple/list."""
    return (float(coords[0]), float(coords[1]))


def _map_coords(coords, depth):
    """Flatten nested coordinate arrays to 2D at the given nesting depth."""
    if depth == 0:
        return _flatten2d(coords)
    return [_map_coords(c, depth - 1) for c in coords]


_DEPTH = {
    "Point": 0,
    "LineString": 1,
    "MultiPoint": 1,
    "Polygon": 2,
    "MultiLineString": 2,
    "MultiPolygon": 3,
}


def normalize_geom(geom: Mapping) -> dict:
    """Return a plain-dict 2D copy of a GeoJSON-like geometry mapping."""
    gtype = geom["type"]
    if gtype == "GeometryCollection":
        raise ValueError("GeometryCollection is not supported")
    if gtype not in GEOM_TYPES:
        raise ValueError(f"Unknown geometry type {gtype!r}")
    return {
        "type": gtype,
        "coordinates": _map_coords(geom["coordinates"], _DEPTH[gtype]),
    }


def geom_bounds(geom: Mapping) -> tuple[float, float, float, float]:
    """(west, south, east, north) over all coordinates (shapely .bounds analog)."""
    xs: list[float] = []
    ys: list[float] = []

    def walk(c, depth):
        if depth == 0:
            xs.append(c[0])
            ys.append(c[1])
        else:
            for sub in c:
                walk(sub, depth - 1)

    walk(geom["coordinates"], _DEPTH[geom["type"]])
    if not xs:
        raise ValueError("empty geometry")
    return (min(xs), min(ys), max(xs), max(ys))


def geom_vertices(geom: Mapping):
    """Flattened (x, y) vertex stream in document order.

    Mirrors the reference's ``geom_xys`` (point.py:68-87): for polygons the
    exterior ring first, then interior rings; multis in member order.
    """
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        yield _flatten2d(coords)
    elif gtype in ("LineString", "MultiPoint"):
        for c in coords:
            yield _flatten2d(c)
    elif gtype in ("Polygon", "MultiLineString"):
        for ring in coords:
            for c in ring:
                yield _flatten2d(c)
    elif gtype == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                for c in ring:
                    yield _flatten2d(c)
    else:
        raise ValueError(gtype)


def polygon_rings(geom: Mapping) -> list[list[tuple[float, float]]]:
    """All rings (exterior + interior, across multi members) of a polygonal geom."""
    if geom["type"] == "Polygon":
        return [list(map(tuple, r)) for r in geom["coordinates"]]
    if geom["type"] == "MultiPolygon":
        return [list(map(tuple, r)) for poly in geom["coordinates"] for r in poly]
    raise ValueError(f"not polygonal: {geom['type']}")


def line_segments(geom: Mapping) -> list[list[tuple[float, float]]]:
    """Component linestrings of a (multi)linestring."""
    if geom["type"] == "LineString":
        return [list(map(tuple, geom["coordinates"]))]
    if geom["type"] == "MultiLineString":
        return [list(map(tuple, r)) for r in geom["coordinates"]]
    raise ValueError(f"not a line: {geom['type']}")


def point_coords(geom: Mapping) -> list[tuple[float, float]]:
    if geom["type"] == "Point":
        return [tuple(geom["coordinates"][:2])]
    if geom["type"] == "MultiPoint":
        return [tuple(c[:2]) for c in geom["coordinates"]]
    raise ValueError(f"not a point: {geom['type']}")


def box(w: float, s: float, e: float, n: float) -> dict:
    """Rectangle polygon (shapely.geometry.box analog, CCW)."""
    return {
        "type": "Polygon",
        "coordinates": [[(w, s), (e, s), (e, n), (w, n), (w, s)]],
    }


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

_Z_FLAG = 0x80000000  # EWKB
_M_FLAG = 0x40000000
_SRID_FLAG = 0x20000000


def _wkb_read_geom(buf: bytes, off: int):
    byte_order = buf[off]
    off += 1
    bo = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    if raw_type & _SRID_FLAG:
        off += 4  # skip srid
    has_z = bool(raw_type & _Z_FLAG) or (1000 <= (raw_type & 0xFFFF) < 2000)
    has_m = bool(raw_type & _M_FLAG) or (2000 <= (raw_type & 0xFFFF) < 3000)
    if 3000 <= (raw_type & 0xFFFF) < 4000:  # ZM
        has_z = has_m = True
    code = (raw_type & 0xFFFF) % 1000
    if code not in _WKB_NAME:
        raise ValueError(f"unsupported WKB geometry code {code}")
    gtype = _WKB_NAME[code]
    ndim = 2 + int(has_z) + int(has_m)

    def read_pt(off):
        vals = struct.unpack_from(bo + "d" * ndim, buf, off)
        return (vals[0], vals[1]), off + 8 * ndim

    def read_ring(off):
        (n,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        pts = []
        for _ in range(n):
            p, off = read_pt(off)
            pts.append(p)
        return pts, off

    if gtype == "Point":
        c, off = read_pt(off)
        return {"type": gtype, "coordinates": list(c)}, off
    if gtype in ("LineString",):
        ring, off = read_ring(off)
        return {"type": gtype, "coordinates": ring}, off
    if gtype == "Polygon":
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            ring, off = read_ring(off)
            rings.append(ring)
        return {"type": gtype, "coordinates": rings}, off
    # multi-geoms: sequence of full WKB sub-geometries
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    subs = []
    for _ in range(n):
        sub, off = _wkb_read_geom(buf, off)
        subs.append(sub["coordinates"])
    return {"type": gtype, "coordinates": subs}, off


def wkb_loads(buf: bytes) -> dict:
    """Parse (E)WKB bytes → 2D GeoJSON-like dict (reference: io.py:73-78)."""
    if isinstance(buf, str):
        buf = bytes.fromhex(buf)
    if isinstance(buf, (bytearray, memoryview)):
        buf = bytes(buf)
    if not isinstance(buf, bytes) or len(buf) < 5 or buf[0] not in (0, 1):
        raise ValueError("not WKB")
    geom, _ = _wkb_read_geom(buf, 0)
    return geom


def wkb_dumps(geom: Mapping) -> bytes:
    """Serialize a 2D geometry dict as little-endian ISO WKB."""
    gtype = geom["type"]
    code = _WKB_CODE[gtype]
    out = bytearray()
    out += b"\x01" + struct.pack("<I", code)

    def w_pt(c):
        out.extend(struct.pack("<dd", float(c[0]), float(c[1])))

    def w_ring(ring):
        out.extend(struct.pack("<I", len(ring)))
        for c in ring:
            w_pt(c)

    coords = geom["coordinates"]
    if gtype == "Point":
        w_pt(coords)
    elif gtype == "LineString":
        w_ring(coords)
    elif gtype == "Polygon":
        out.extend(struct.pack("<I", len(coords)))
        for ring in coords:
            w_ring(ring)
    else:
        member = {
            "MultiPoint": "Point",
            "MultiLineString": "LineString",
            "MultiPolygon": "Polygon",
        }[gtype]
        out.extend(struct.pack("<I", len(coords)))
        for sub in coords:
            out.extend(wkb_dumps({"type": member, "coordinates": sub}))
    return bytes(out)


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

_WKT_HEAD = re.compile(
    r"^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)"
    r"\s*(Z|M|ZM)?\s*(EMPTY|\(.*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)

_WKT_TYPE = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
}


def _parse_paren(s: str, pos: int):
    """Parse a balanced paren group starting at s[pos] == '(' → nested lists."""
    assert s[pos] == "("
    pos += 1
    items: list = []
    token: list[str] = []

    def flush():
        tok = "".join(token).strip()
        if tok:
            items.append(tok)
        token.clear()

    while pos < len(s):
        ch = s[pos]
        if ch == "(":
            sub, pos = _parse_paren(s, pos)
            items.append(sub)
        elif ch == ")":
            flush()
            return items, pos + 1
        elif ch == ",":
            flush()
            pos += 1
        else:
            token.append(ch)
            pos += 1
    raise ValueError("unbalanced WKT parens")


def _coord_from_token(tok: str):
    parts = tok.split()
    if len(parts) < 2:
        raise ValueError(f"bad WKT coordinate {tok!r}")
    return (float(parts[0]), float(parts[1]))


def wkt_loads(s: str) -> dict:
    """Parse WKT text → 2D geometry dict (reference: io.py:67-71)."""
    if not isinstance(s, str):
        raise ValueError("not WKT")
    m = _WKT_HEAD.match(s)
    if not m:
        raise ValueError(f"not WKT: {s[:40]!r}")
    gtype = _WKT_TYPE[m.group(1).upper()]
    body = m.group(3)
    if body.upper() == "EMPTY":
        raise ValueError("EMPTY geometries not supported")
    tree, _ = _parse_paren(body, 0)

    def leaves_to_coords(node):
        if isinstance(node, str):
            return _coord_from_token(node)
        return [leaves_to_coords(c) for c in node]

    coords = leaves_to_coords(tree)
    if gtype == "Point":
        coords = coords[0] if isinstance(coords, list) else coords
    elif gtype == "MultiPoint":
        # both MULTIPOINT (1 1, 2 2) and MULTIPOINT ((1 1), (2 2))
        coords = [c[0] if isinstance(c, list) and len(c) == 1 else c for c in coords]
    return normalize_geom({"type": gtype, "coordinates": coords})


def _fmt_coord(c):
    return f"{c[0]:.10g} {c[1]:.10g}"


def wkt_dumps(geom: Mapping) -> str:
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        return f"POINT ({_fmt_coord(coords)})"
    if gtype in ("LineString", "MultiPoint"):
        inner = ", ".join(_fmt_coord(c) for c in coords)
        return f"{gtype.upper()} ({inner})"
    if gtype in ("Polygon", "MultiLineString"):
        inner = ", ".join(
            "(" + ", ".join(_fmt_coord(c) for c in ring) + ")" for ring in coords
        )
        return f"{gtype.upper()} ({inner})"
    if gtype == "MultiPolygon":
        inner = ", ".join(
            "("
            + ", ".join(
                "(" + ", ".join(_fmt_coord(c) for c in ring) + ")" for ring in poly
            )
            + ")"
            for poly in coords
        )
        return f"MULTIPOLYGON ({inner})"
    raise ValueError(gtype)


# ---------------------------------------------------------------------------
# feature-level ingestion (reference: io.py:48-146)
# ---------------------------------------------------------------------------


def wrap_geom(geom: Mapping) -> dict:
    """Wrap a bare geometry in a Feature (reference: io.py:48-50)."""
    return {"type": "Feature", "properties": {}, "geometry": normalize_geom(geom)}


def parse_feature(obj) -> dict:
    """Coerce one object into a Feature dict (reference: io.py:53-89).

    Accepts: objects with ``__geo_interface__``, WKT strings, WKB bytes/hex,
    GeoJSON-like mappings (geometry or Feature).
    """
    gi = getattr(obj, "__geo_interface__", None)
    if gi is not None:
        if gi["type"] in GEOM_TYPES:
            return wrap_geom(gi)
        if gi["type"] == "Feature":
            out = dict(gi)
            out["geometry"] = normalize_geom(out["geometry"])
            return out

    if isinstance(obj, str):
        try:
            return wrap_geom(wkt_loads(obj))
        except ValueError:
            pass
        try:
            return wrap_geom(wkb_loads(obj))
        except (ValueError, struct.error):
            pass

    if isinstance(obj, (bytes, bytearray, memoryview)):
        try:
            return wrap_geom(wkb_loads(bytes(obj)))
        except (ValueError, struct.error):
            pass

    if isinstance(obj, Mapping):
        try:
            if obj["type"] in GEOM_TYPES:
                return wrap_geom(obj)
            if obj["type"] == "Feature":
                out = dict(obj)
                out["geometry"] = normalize_geom(out["geometry"])
                if "properties" not in out or out["properties"] is None:
                    out["properties"] = {}
                return out
        except (KeyError, TypeError):
            pass

    raise ValueError(f"Can't parse {obj!r} as a geojson Feature object")


def read_features(obj, layer: int = 0):
    """Polymorphic vector ingestion (reference: io.py:92-139).

    Supported inputs: GeoJSON string (Feature / FeatureCollection / geometry),
    WKT string, WKB bytes/hex, mapping, ``__geo_interface__`` object, or any
    iterable of those. Vector FILE paths (shapefile/GeoJSON file/GPKG —
    reference io.py:94-109) are read through the optional ``fiona`` package
    when it is installed; the zero-GDAL core otherwise raises with a
    pointer at the parquet zone-table path.
    """
    features_iter = None
    if hasattr(obj, "__fspath__"):  # pathlib.Path etc. (reference accepts
        import os as _os            # Path objects via fiona — io.py:94)

        obj = _os.fspath(obj)
    if isinstance(obj, str):
        import os as _os

        looks_like_path = (
            "\n" not in obj
            and not obj.lstrip().startswith(("{", "["))
            and _os.path.exists(obj)
        )
        if looks_like_path:
            return _fiona_features(obj, layer)
        try:
            mapping = json.loads(obj)
        except (ValueError, json.JSONDecodeError):
            features_iter = [parse_feature(obj)]
        else:
            if isinstance(mapping, Mapping) and mapping.get("type") == "FeatureCollection":
                features_iter = [parse_feature(f) for f in mapping["features"]]
            else:
                features_iter = [parse_feature(mapping)]
    elif isinstance(obj, Mapping):
        if obj.get("type") == "FeatureCollection":
            features_iter = [parse_feature(f) for f in obj["features"]]
        else:
            features_iter = [parse_feature(obj)]
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        features_iter = [parse_feature(obj)]
    elif hasattr(obj, "__geo_interface__"):
        mapping = obj.__geo_interface__
        if mapping["type"] == "FeatureCollection":
            features_iter = [parse_feature(f) for f in mapping["features"]]
        else:
            features_iter = [parse_feature(mapping)]
    elif isinstance(obj, Iterable):
        features_iter = (parse_feature(x) for x in obj)

    if features_iter is None:
        raise ValueError("Object is not a recognized source of Features")
    return features_iter


def _fiona_features(path: str, layer: int = 0):
    """Vector-file ingestion (reference io.py:36-45 fiona_generator /
    io.py:94-109 path branch): fiona/OGR when installed (any OGR format);
    otherwise the engine's own from-scratch readers cover the common
    cases — ESRI Shapefile (shpcodec, public spec) and GeoJSON files —
    so vector file paths work in GDAL-free environments too."""
    try:
        import fiona
    except ImportError:
        fiona = None
    if fiona is not None:
        with fiona.open(path, "r", layer=layer) as src:
            return [parse_feature(dict(f)) for f in src]
    low = str(path).lower()
    if low.endswith(".shp"):
        from .shpcodec import read_shapefile

        return [parse_feature(f) for f in read_shapefile(path)]
    if low.endswith(".gpkg"):
        from .gpkgcodec import read_geopackage

        return [parse_feature(f) for f in read_geopackage(path, layer)]
    if low.endswith((".geojson", ".json")):
        with open(path) as f:
            return list(read_features(f.read(), layer))
    raise ValueError(
        "reading this vector format requires the optional 'fiona' package, "
        "which is not installed; the built-in readers cover .shp and "
        ".geojson paths — otherwise pass WKT/WKB/GeoJSON/__geo_interface__ "
        "features or parquet zone tables instead"
    )


def read_featurecollection(obj, layer: int = 0) -> dict:
    """Materialize into a FeatureCollection dict (reference: io.py:142-146)."""
    return {"type": "FeatureCollection", "features": list(read_features(obj, layer))}
