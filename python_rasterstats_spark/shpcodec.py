"""Minimal from-scratch ESRI Shapefile reader — stdlib only, no GDAL.

Implements the public ESRI Shapefile Technical Description (July 1998)
plus dBASE III .dbf attributes — the subset the reference project's own
test vectors use (rasterstats tests/data/*.shp: Point, MultiPoint,
PolyLine, Polygon, incl. multi-part) so vector file paths work in this
container without fiona:

- .shp: shape types 0 (Null), 1/11/21 (Point/Z/M), 3/13/23 (PolyLine),
  5/15/25 (Polygon), 8/18/28 (MultiPoint); Z/M coordinates are dropped
  (2-D engine, same as geom.geom_xys)
- polygon ring nesting per spec: exterior rings are CLOCKWISE (negative
  shoelace area in y-up coordinates); holes are counter-clockwise and
  attach to the exterior ring containing them; several exteriors → a
  GeoJSON MultiPolygon
- .dbf: dBASE III header + C/N/F/L/D fields → typed feature properties
  (missing .dbf → empty properties)

Reference analog: rasterstats reads vector paths through fiona/OGR
(io.py:36-45, 94-109). Driver-side ingestion only — zones immediately
become a Spark DataFrame (sources/tables.features_to_zones).
"""

from __future__ import annotations

import os
import struct


class ShapefileError(ValueError):
    pass


def _signed_area(ring) -> float:
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


def _point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        if (y0 > y) != (y1 > y):
            xi = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
            if x < xi:
                inside = not inside
    return inside


def _rings_to_geom(rings: list) -> dict:
    """Shapefile polygon rings → GeoJSON Polygon/MultiPolygon (nesting by
    orientation + containment, per the spec's CW-exterior rule)."""
    outers = [r for r in rings if _signed_area(r) < 0]
    holes = [r for r in rings if _signed_area(r) >= 0]
    if not outers:  # degenerate orientation: treat every ring as exterior
        outers, holes = rings, []
    polys = [[o] for o in outers]
    for hole in holes:
        placed = False
        for poly in polys:
            if _point_in_ring(hole[0], poly[0]):
                poly.append(hole)
                placed = True
                break
        if not placed:  # orphan hole: safest is its own exterior
            polys.append([hole])
    coords = [[[list(pt) for pt in ring] for ring in poly] for poly in polys]
    if len(coords) == 1:
        return {"type": "Polygon", "coordinates": coords[0]}
    return {"type": "MultiPolygon", "coordinates": coords}


# shape types whose XY layout this parser understands: Null, Point /
# PolyLine / Polygon / MultiPoint and their Z (+10) / M (+20) variants.
# MultiPatch (31) etc. must NOT fall through `% 10` onto a supported base
# — they would silently parse garbage from their bbox bytes.
_KNOWN_SHAPE_TYPES = frozenset({0, 1, 3, 5, 8, 11, 13, 15, 18, 21, 23, 25, 28})


def _parse_shape(buf: bytes) -> dict | None:
    (stype,) = struct.unpack_from("<i", buf, 0)
    if stype not in _KNOWN_SHAPE_TYPES:
        raise ShapefileError(f"unsupported shape type {stype}")
    base = stype % 10  # Z (+10) and M (+20) variants share the XY layout
    if stype == 0:
        return None
    if base == 1:  # Point
        x, y = struct.unpack_from("<2d", buf, 4)
        return {"type": "Point", "coordinates": [x, y]}
    if base == 8:  # MultiPoint: bbox + npoints + points
        (npts,) = struct.unpack_from("<i", buf, 36)
        pts = struct.unpack_from(f"<{2 * npts}d", buf, 40)
        coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(npts)]
        if npts == 1:
            return {"type": "Point", "coordinates": coords[0]}
        return {"type": "MultiPoint", "coordinates": coords}
    if base in (3, 5):  # PolyLine / Polygon: bbox + nparts + npoints
        nparts, npts = struct.unpack_from("<2i", buf, 36)
        parts = struct.unpack_from(f"<{nparts}i", buf, 44)
        off = 44 + 4 * nparts
        pts = struct.unpack_from(f"<{2 * npts}d", buf, off)
        coords = [(pts[2 * i], pts[2 * i + 1]) for i in range(npts)]
        rings = [
            list(coords[parts[i]: (parts[i + 1] if i + 1 < nparts else npts)])
            for i in range(nparts)
        ]
        if base == 3:
            lines = [[list(pt) for pt in r] for r in rings]
            if len(lines) == 1:
                return {"type": "LineString", "coordinates": lines[0]}
            return {"type": "MultiLineString", "coordinates": lines}
        return _rings_to_geom(rings)
    raise ShapefileError(f"unsupported shapefile shape type {stype}")


def _read_dbf(path: str) -> list[dict]:
    """dBASE III attribute records → one properties dict per record."""
    if not os.path.exists(path):
        return []
    with open(path, "rb") as f:
        data = f.read()
    nrec, hsize, rsize = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < hsize - 1 and data[off] != 0x0D:
        name = data[off: off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    out = []
    for i in range(nrec):
        rec = data[hsize + i * rsize: hsize + (i + 1) * rsize]
        if not rec or rec[0] == 0x2A:  # deleted: keep a placeholder so
            out.append({})             # .shp record alignment holds
            continue
        props: dict = {}
        p = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[p: p + flen].decode("latin-1").strip()
            p += flen
            if ftype in ("N", "F"):
                if not raw:
                    props[name] = None
                elif ftype == "N" and fdec == 0 and "." not in raw:
                    try:
                        props[name] = int(raw)
                    except ValueError:
                        props[name] = None
                else:
                    try:
                        props[name] = float(raw)
                    except ValueError:
                        props[name] = None
            elif ftype == "L":
                # blank = uninitialized → None (membership must not use
                # `in str`: "" is a substring of everything)
                props[name] = (
                    True if raw in ("T", "t", "Y", "y")
                    else False if raw in ("F", "f", "N", "n")
                    else None
                )
            else:
                props[name] = raw
        out.append(props)
    return out


def read_shapefile(path: str) -> list[dict]:
    """Read ``path`` (.shp, with optional sibling .dbf) → GeoJSON-style
    Feature dicts in record order."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 100 or struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ShapefileError(f"{path}: not a shapefile (bad file code)")
    props = _read_dbf(os.path.splitext(path)[0] + ".dbf")
    feats = []
    off = 100
    i = 0
    while off + 8 <= len(data):
        _recno, clen = struct.unpack_from(">2i", data, off)
        content = data[off + 8: off + 8 + 2 * clen]
        off += 8 + 2 * clen
        geom = _parse_shape(content)
        if geom is None:
            i += 1
            continue
        feats.append(
            {
                "type": "Feature",
                "id": str(i),
                "properties": props[i] if i < len(props) else {},
                "geometry": geom,
            }
        )
        i += 1
    return feats
