"""Minimal from-scratch GeoTIFF reader — numpy + zlib, no GDAL/rasterio.

Implements the subset of TIFF 6.0 (public Adobe spec) + GeoTIFF 1.1 (OGC
19-008r4) that real-world single/multi-band rasters use — enough to read
the reference project's own test rasters (rasterstats tests/data/*.tif:
stripped float32, uncompressed and LZW) and typical GDAL GTiff output:

- classic TIFF, both byte orders (II/MM); first IFD only (band stacks via
  SamplesPerPixel, not multi-IFD)
- strip AND tile layouts, PlanarConfiguration=1 (chunky)
- compression: 1 none, 5 LZW (TIFF variant: MSB-first codes, early
  change), 8/32946 Deflate (zlib), 32773 PackBits
- predictor: 1 none, 2 horizontal differencing
- dtypes: {uint,int} × {8,16,32,64} and float{32,64} via
  BitsPerSample + SampleFormat
- georeferencing: ModelPixelScale+ModelTiepoint or ModelTransformation →
  the 6-tuple affine (a, b, c, d, e, f) used across this engine
- nodata: the GDAL_NODATA ASCII tag (42113)

Reference analog: rasterstats reads rasters through rasterio/GDAL
(io.py:276-285); this container has no GDAL, so the engine carries its
own reader the same way it carries its own JPEG codec (jpegcodec.py).
Scale note: this is the DRIVER-side ingestion path for file-based
corpora (one decode → raster_to_tables → distributed everywhere after);
the hot distributed path stays on the parquet tile schema.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class TiffError(ValueError):
    """Not a TIFF, or a TIFF feature outside this reader's subset."""


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(data: bytes, bo: str, off: int) -> dict:
    """First-IFD tag dict: {tag: value | tuple | bytes}."""
    if off + 2 > len(data):
        raise TiffError("truncated TIFF: IFD offset past EOF")
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: spec says skip
        nbytes = size * cnt
        voff = base + 8 if nbytes <= 4 else struct.unpack_from(
            bo + "I", data, base + 8
        )[0]
        raw = data[voff: voff + nbytes]
        if typ == 2:  # ASCII
            tags[tag] = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ in (5, 10):  # RATIONALs: numerator/denominator pairs
            kind = "I" if typ == 5 else "i"
            vals = struct.unpack(bo + kind * (2 * cnt), raw)
            tags[tag] = tuple(
                vals[2 * j] / (vals[2 * j + 1] or 1) for j in range(cnt)
            )
        elif typ == 7:  # UNDEFINED
            tags[tag] = raw
        else:
            vals = struct.unpack(bo + _TYPE_FMT[typ] * cnt, raw)
            tags[tag] = vals[0] if cnt == 1 else vals
    return tags


def _aslist(v) -> list:
    return list(v) if isinstance(v, tuple) else [v]


def lzw_decode(buf: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first variable-width codes
    9→12 bits, ClearCode 256, EOI 257, 'early change' (the code width
    bumps one code before the table fills)."""
    data = buf
    nbits = len(data) * 8
    bitpos = 0
    out = bytearray()
    table: list = []
    prev = b""
    width = 9

    def reset():
        nonlocal table, prev, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = b""
        width = 9

    reset()
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        # the widest code (12 bits) spans at most 3 bytes
        chunk = int.from_bytes(data[byte0: byte0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if not prev:
            if code >= len(table):
                raise TiffError("corrupt LZW stream: first code not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def packbits_decode(buf: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(buf):
        n = buf[i]
        i += 1
        if n < 128:
            out += buf[i: i + n + 1]
            i += n + 1
        elif n > 128:
            out += buf[i: i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _decompress(seg: bytes, compression: int) -> bytes:
    if compression == 1:
        return seg
    if compression == 5:
        return lzw_decode(seg)
    if compression in (8, 32946):
        return zlib.decompress(seg)
    if compression == 32773:
        return packbits_decode(seg)
    raise TiffError(f"unsupported TIFF compression {compression}")


def _dtype(tags: dict, bo: str) -> np.dtype:
    bits = _aslist(tags.get(258, 8))[0]
    fmt = _aslist(tags.get(339, 1))[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None or bits % 8 or (kind == "f" and bits not in (32, 64)):
        raise TiffError(f"unsupported sample format {fmt}/{bits} bits")
    return np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")


def _affine(tags: dict):
    if 34264 in tags:  # ModelTransformation: 4×4 row-major
        m = _aslist(tags[34264])
        return (m[0], m[1], m[3], m[4], m[5], m[7])
    if 33550 in tags and 33922 in tags:
        sx, sy = _aslist(tags[33550])[:2]
        tp = _aslist(tags[33922])
        i, j, _k, x, y, _z = tp[:6]
        # raster (i,j) maps to model (x,y); y flips (north-up)
        return (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    return None


def read_geotiff(path_or_bytes):
    """Decode a GeoTIFF → (array, affine, nodata).

    ``array`` is (h, w) for single-band, (bands, h, w) otherwise (the
    engine's multiband convention); ``affine`` is the 6-tuple or None
    when the file carries no geokeys; ``nodata`` is float or None.
    """
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic == 43:
        raise TiffError("BigTIFF is not supported by this reader")
    if magic != 42:
        raise TiffError("not a TIFF (bad magic)")
    tags = _read_ifd(data, bo, ifd_off)

    w, h = tags.get(256), tags.get(257)
    if not w or not h:
        raise TiffError("TIFF missing image dimensions")
    spp = tags.get(277, 1)
    if tags.get(284, 1) != 1 and spp > 1:
        raise TiffError("planar (non-chunky) TIFF is not supported")
    comp = tags.get(259, 1)
    pred = tags.get(317, 1)
    if pred not in (1, 2):
        raise TiffError(f"unsupported TIFF predictor {pred}")
    dt = _dtype(tags, bo)

    def undo_predictor(block: np.ndarray) -> np.ndarray:
        # block is (rows, width, spp); horizontal differencing runs PER
        # SAMPLE along the width axis (TIFF 6.0 §14 — channels interleave
        # in chunky layout, so a flat row cumsum would mix them)
        if pred == 2:
            return np.cumsum(block, axis=1, dtype=block.dtype)
        return block

    if 324 in tags:  # tiled layout
        if 322 not in tags or 323 not in tags or 325 not in tags:
            raise TiffError("tiled TIFF missing tile dims/byte counts")
        tw, tl = tags[322], tags[323]
        offs, cnts = _aslist(tags[324]), _aslist(tags[325])
        ntx = -(-w // tw)
        arr = np.zeros((h, w, spp), dtype=dt)
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decompress(data[o: o + c], comp)
            block = undo_predictor(
                np.frombuffer(raw, dtype=dt, count=tl * tw * spp)
                .reshape(tl, tw, spp)
            )
            r0, c0 = (ti // ntx) * tl, (ti % ntx) * tw
            rs, cs = min(tl, h - r0), min(tw, w - c0)
            arr[r0: r0 + rs, c0: c0 + cs] = block[:rs, :cs]
    else:  # stripped layout
        if 273 not in tags or 279 not in tags:
            raise TiffError("TIFF missing strip offsets/byte counts")
        rps = tags.get(278, h)
        offs, cnts = _aslist(tags[273]), _aslist(tags[279])
        arr = np.zeros((h, w, spp), dtype=dt)
        row = 0
        for o, c in zip(offs, cnts):
            rows = min(rps, h - row)
            raw = _decompress(data[o: o + c], comp)
            block = np.frombuffer(raw, dtype=dt, count=rows * w * spp)
            arr[row: row + rows] = undo_predictor(
                block.reshape(rows, w, spp)
            )
            row += rows

    nodata = None
    if 42113 in tags:
        txt = tags[42113].strip()
        if txt and txt.lower() != "nan":
            try:
                nodata = float(txt)
            except ValueError:
                nodata = None
        elif txt.lower() == "nan":
            nodata = float("nan")

    out = arr[:, :, 0] if spp == 1 else np.moveaxis(arr, 2, 0)
    return np.ascontiguousarray(out), _affine(tags), nodata


def write_geotiff(
    path,
    arr: np.ndarray,
    affine,
    *,
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int = 64,
) -> None:
    """Write a single-band 2-D array as a little-endian stripped GeoTIFF
    (compression 'deflate' or 'none') — the sink twin of read_geotiff,
    enough to export mini-rasters / fixtures that GDAL and this reader
    both open. North-up affine only (b == d == 0)."""
    if arr.ndim != 2:
        raise TiffError("write_geotiff writes single-band 2-D arrays")
    a, b, c, d, e, f = [float(v) for v in affine]
    if b or d:
        raise TiffError("write_geotiff supports north-up affines only")
    comp = {"deflate": 8, "none": 1}.get(compression)
    if comp is None:
        raise TiffError(f"unsupported write compression {compression!r}")
    h, w = arr.shape
    dt = arr.dtype.newbyteorder("<")
    data = np.ascontiguousarray(arr.astype(dt))
    segs = []
    for r0 in range(0, h, rows_per_strip):
        raw = data[r0: r0 + rows_per_strip].tobytes()
        segs.append(zlib.compress(raw) if comp == 8 else raw)

    entries: list = []

    def add(tag, typ, vals):
        if typ == 2:
            entries.append((tag, typ, vals.encode() + b"\x00"))
        else:
            fmt = {3: "H", 4: "I", 12: "d"}[typ]
            entries.append((tag, typ, struct.pack("<" + fmt * len(vals), *vals)))

    sf = {"u": 1, "i": 2, "f": 3}[dt.kind]
    # dimensions/strip tags as LONG: SHORT would overflow past 65,535 px
    # (classic TIFF allows either type for these tags)
    add(256, 4, [w]); add(257, 4, [h])
    add(258, 3, [dt.itemsize * 8]); add(259, 3, [comp])
    add(262, 3, [1]); add(277, 3, [1]); add(278, 4, [rows_per_strip])
    add(284, 3, [1]); add(339, 3, [sf])
    add(33550, 12, [a, -e, 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, c, f, 0.0])
    if nodata is not None:
        add(42113, 2, repr(float(nodata)))
    add(273, 4, [0] * len(segs))  # patched below
    add(279, 4, [len(s) for s in segs])
    entries.sort(key=lambda x: x[0])

    n = len(entries)
    values_off = 8 + 2 + 12 * n + 4
    body = bytearray()
    head = bytearray(b"II" + struct.pack("<HI", 42, 8))
    head += struct.pack("<H", n)
    # lay out overflow values first to learn where data starts
    layout = []
    for tag, typ, raw in entries:
        # ASCII count INCLUDES the terminating NUL (TIFF 6.0 §2)
        cnt = (len(raw) if typ == 2 else
               len(raw) // {3: 2, 4: 4, 12: 8}[typ])
        if len(raw) <= 4:
            layout.append((tag, typ, cnt, raw.ljust(4, b"\x00"), None))
        else:
            layout.append((tag, typ, cnt, None, values_off + len(body)))
            body += raw
    data_off = values_off + len(body)
    offs = []
    for s in segs:
        offs.append(data_off)
        data_off += len(s)
    for tag, typ, cnt, inline, off in layout:
        head += struct.pack("<HHI", tag, typ, cnt)
        if tag == 273:
            raw = struct.pack("<" + "I" * len(offs), *offs)
            if len(raw) <= 4:
                head += raw.ljust(4, b"\x00")
            else:
                body[off - values_off: off - values_off + len(raw)] = raw
                head += struct.pack("<I", off)
        elif inline is not None:
            head += inline
        else:
            head += struct.pack("<I", off)
    head += struct.pack("<I", 0)
    with open(path, "wb") as fh:
        fh.write(bytes(head) + bytes(body) + b"".join(segs))
