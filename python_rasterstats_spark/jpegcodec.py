"""Baseline-sequential JPEG codec from scratch (ITU-T T.81 / JFIF),
numpy + stdlib only — no imaging libraries.

Closes the r2 verdict's last environment boundary ("real JPEG codec"):
tile payloads tagged ``fmt='jpeg'`` are now REAL JPEG byte streams —
SOI/APP0/DQT/SOF0/DHT/SOS markers, standard Annex K quantization +
Huffman tables, zigzag run-length entropy coding with byte stuffing,
8×8 DCT-II — decodable by any JPEG reader, and the decoder accepts
baseline grayscale JPEGs produced by any encoder (DRI/RSTn supported).

Scope (documented): the full practical T.81 DCT matrix —
baseline-sequential (SOF0/1), progressive (SOF2), sequential-
arithmetic (SOF9) and progressive-arithmetic (SOF10; QM coder —
qmcoder.py) — 8-bit,
grayscale and color in any sampling layout with integral upsample
ratios — 4:4:4, 4:2:0 (the layout virtually every camera/web encoder
emits), 4:2:2, 4:4:0, 4:1:1 (YCbCr BT.601; color decode returns a
(3, h, w) uint8 array — the corpus's multiband convention; the
encoders can emit all five in all three entropy modes). Progressive
decode covers the full T.81 G feature set — spectral selection,
successive approximation (DC + AC refinement with EOB runs),
interleaved and single-component scans, DHT redefinition between
scans — and jpeg_encode_progressive emits a spectral+SA scan script
whose decode is coefficient-exact against the baseline encoding of
the same image (pinned in test_jpeg); jpeg_encode_arithmetic's
output is pinned the same way (and DAC conditioning is honored), as
is jpeg_encode_arithmetic_progressive's (SOF10, T.81 G.1.3 models).
Baseline files may also carry one non-interleaved scan per component
(T.81-legal; decoded via the same per-scan machinery), and the color
convention follows the libjpeg rule: an Adobe APP14 transform byte
wins, component ids 'R','G','B' mean raw RGB planes, otherwise
YCbCr. Lossless/hierarchical streams, Adobe YCCK, and
fractional-ratio layouts (e.g. 3:2, which would need an
interpolating upsampler) raise NotImplementedError. Float
rasters are affinely quantized to uint8 with the (lo, scale) pair
carried in an APP15 segment (standard-legal: unknown APPn segments are
skipped by other decoders), so OUR decoder returns float32 while
foreign decoders still see a valid grayscale image.

Implementation notes:
- The 2D DCT uses the orthonormal basis matrix T (T @ B @ T.T equals the
  T.81 FDCT exactly); all blocks of a tile transform in one einsum.
- Huffman decode uses a 16-bit peek LUT per table (symbol, code length),
  built once per DHT — no per-bit tree walking.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)  # Annex K.1, in natural (row-major) order

# Annex K.3: standard DC luminance Huffman spec (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.5: standard AC luminance Huffman spec
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)  # Annex K.2, natural order

_APP15_TAG = b"PRSF"  # float rescale sidecar: lo, scale (little-endian f64)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    t = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    t[0] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _quality_qt(quality: int) -> np.ndarray:
    """Annex-K luminance table scaled by the conventional quality formula."""
    return _scaled_qt(STD_LUM_QT, quality)


def _chroma_qt(quality: int) -> np.ndarray:
    """Annex-K chrominance table, same quality scaling."""
    return _scaled_qt(STD_CHROMA_QT, quality)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    sf = 5000 // q if q < 50 else 200 - 2 * q
    qt = (base * sf + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int64)


# chroma-subsampling layouts: name -> Y component's (h, v) factors
SAMPLING_LAYOUTS = {"444": (1, 1), "420": (2, 2), "422": (2, 1),
                    "440": (1, 2), "411": (4, 1)}


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits, vals):
    """16-bit peek LUT: window → (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16) - 1
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _category(v: int) -> int:
    """Bit category of a (possibly negative) coefficient (T.81 F.1.2)."""
    return abs(int(v)).bit_length()


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)
        return bytes(self.buf)


def _blocks_of(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8-multiples and split into 8×8 blocks in
    MCU scan order. Returns (blocks[nb, 8, 8], blocks_h, blocks_w)."""
    h, w = arr.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    bh, bw = arr.shape[0] // 8, arr.shape[1] // 8
    blocks = arr.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _quantized_zigzag(plane, qt):
    """8x8-block DCT + quantize + zigzag for one level-shifted plane."""
    blocks, _, _ = _blocks_of(plane - 128.0)
    coeffs = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
    qz = np.rint(coeffs / qt.reshape(8, 8)).astype(np.int64)
    return qz.reshape(-1, 64)[:, ZIGZAG]  # natural -> zigzag scan order


def _encode_block(bw_, blk, pred, dc_codes, ac_codes):
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    cat = _category(diff)
    code, ln = dc_codes[cat]
    bw_.write(code, ln)
    if cat:
        bw_.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for v in blk[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw_.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw_.write(code, ln)
        bw_.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw_.write(code, ln)
    return pred


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def jpeg_encode(arr: np.ndarray, *, quality: int = 95) -> bytes:
    """Encode a 2D array as a baseline grayscale JPEG.

    uint8 input encodes directly; float input is affinely quantized to
    uint8 with (lo, scale) stored in an APP15 sidecar segment so
    jpeg_decode returns float32. NaN/Inf are rejected (lossy DCT cannot
    carry a sentinel). 3-band uint8 input routes to jpeg_encode_color."""
    a = np.asarray(arr)
    if a.ndim == 3:
        return jpeg_encode_color(a, quality=quality)
    assert a.ndim == 2, "jpeg codec takes one band or 3-band color"
    h, w = a.shape
    app15 = b""
    if np.issubdtype(a.dtype, np.floating):
        if not np.isfinite(a).all():
            raise ValueError(
                "jpeg encoding requires finite values (lossy DCT cannot "
                "carry a NaN sentinel) — use png/npy for nodata-bearing tiles"
            )
        lo = float(a.min())
        hi = float(a.max())
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        a8 = np.rint((a.astype(np.float64) - lo) / scale)
        app15 = _APP15_TAG + struct.pack("<dd", lo, scale)
    else:
        a8 = a.astype(np.float64)
        if a8.min() < 0 or a8.max() > 255:
            raise ValueError("integer input must fit uint8")
    qt = _quality_qt(quality)
    zz = _quantized_zigzag(a8, qt)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw_ = _BitWriter()
    pred = 0
    for blk in zz:
        pred = _encode_block(bw_, blk, pred, dc_codes, ac_codes)
    entropy = bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, _JFIF_APP0)
    if app15:
        out += _seg(0xEF, app15)  # APP15 float sidecar
    out += _seg(0xDB, b"\x00" + bytes(qt[ZIGZAG].tolist()))  # DQT (zigzag)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb_to_ycbcr(rgb):
    """(3, h, w) float64 RGB -> YCbCr (JFIF / ITU-R BT.601 full-range)."""
    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr])


def _ycbcr_to_rgb(ycc):
    y, cb, cr = ycc
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b])


def jpeg_encode_color(rgb: np.ndarray, *, quality: int = 95,
                      sampling: str = "444") -> bytes:
    """Encode a 3-band uint8 image ((3, h, w) or (h, w, 3)) as a baseline
    color JPEG: YCbCr (BT.601 full-range), Annex-K luminance + chrominance
    quantization tables. ``sampling='444'`` interleaves one block per
    component per MCU; ``'420'`` subsamples chroma 2×2 (block means) with
    the standard 4-Y-blocks-per-MCU layout — the layout virtually every
    camera/web encoder emits; ``'422'`` (2×1), ``'440'`` (1×2) and
    ``'411'`` (4×1) use the same general MCU interleave with the
    corresponding chroma block means. Huffman tables are shared across
    components — legal (SOS just references table ids)."""
    a = np.asarray(rgb)
    if a.ndim == 3 and a.shape[-1] == 3 and a.shape[0] != 3:
        a = np.transpose(a, (2, 0, 1))
    assert a.ndim == 3 and a.shape[0] == 3, "color input must be 3-band"
    if np.issubdtype(a.dtype, np.floating):
        raise ValueError("color jpeg takes uint8 bands")
    if sampling not in SAMPLING_LAYOUTS:
        raise ValueError("sampling must be one of '444','420','422','440','411'")
    h, w = a.shape[1:]
    planes = _rgb_to_ycbcr(a.astype(np.float64))
    qts = [_quality_qt(quality), _chroma_qt(quality)]
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw_ = _BitWriter()
    if sampling == "444":
        samps = ((1, 1), (1, 1), (1, 1))
        zzs = [
            _quantized_zigzag(planes[0], qts[0]),
            _quantized_zigzag(planes[1], qts[1]),
            _quantized_zigzag(planes[2], qts[1]),
        ]
        preds = [0, 0, 0]
        for bi in range(zzs[0].shape[0]):
            for ci in range(3):
                preds[ci] = _encode_block(
                    bw_, zzs[ci][bi], preds[ci], dc_codes, ac_codes
                )
    else:
        sh0, sv0 = SAMPLING_LAYOUTS[sampling]
        samps = ((sh0, sv0), (1, 1), (1, 1))
        # pad Y to MCU multiples so tiling is exact; chroma = sv0×sh0 means
        mh, mw = 8 * sv0, 8 * sh0
        yp = planes[0]
        ph, pw = (-h) % mh, (-w) % mw
        if ph or pw:
            yp = np.pad(yp, ((0, ph), (0, pw)), mode="edge")
        chh, chw = yp.shape[0] // sv0, yp.shape[1] // sh0
        chroma = []
        for pl in planes[1:]:
            pc = np.pad(pl, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else pl
            chroma.append(pc.reshape(chh, sv0, chw, sh0).mean(axis=(1, 3)))
        zz_y = _quantized_zigzag(yp, qts[0])
        zz_c = [_quantized_zigzag(c, qts[1]) for c in chroma]
        mcux, mcuy = yp.shape[1] // mw, yp.shape[0] // mh
        bw_y = mcux * sh0  # Y blocks per row
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(sv0):
                    for u in range(sh0):
                        bi = (my * sv0 + v) * bw_y + (mx * sh0 + u)
                        preds[0] = _encode_block(
                            bw_, zz_y[bi], preds[0], dc_codes, ac_codes
                        )
                ci_b = my * mcux + mx
                preds[1] = _encode_block(
                    bw_, zz_c[0][ci_b], preds[1], dc_codes, ac_codes
                )
                preds[2] = _encode_block(
                    bw_, zz_c[1][ci_b], preds[2], dc_codes, ac_codes
                )
    entropy = bw_.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, _JFIF_APP0)
    out += _seg(0xDB, b"\x00" + bytes(qts[0][ZIGZAG].tolist()))
    out += _seg(0xDB, b"\x01" + bytes(qts[1][ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, tq), (sh, sv) in zip(((1, 0), (2, 1), (3, 1)), samps):
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out += _seg(0xDA, sos + bytes([0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _flat_ac_bits_vals():
    """A valid (canonical, non-degenerate) Huffman table over every AC
    symbol a progressive scan can emit: (run<<4)|size for size 0..10 —
    size 0 covers EOB0..EOB14 (run 0..14) and ZRL (run 15). Uniform
    9-bit codes (Kraft sum 176/512 < 1; the all-ones code stays unused),
    so no per-scan frequency pass is needed. ~1 bit/symbol worse than
    Annex K — irrelevant for a correctness-first encoder."""
    vals = [(r << 4) | s for r in range(16) for s in range(11)]
    bits = [0] * 16
    bits[8] = len(vals)  # all codes length 9
    return bits, vals


def _emit_vli(bw_, v: int, cat: int) -> None:
    if cat:
        bw_.write(v if v > 0 else v + (1 << cat) - 1, cat)


def _frame_headers(sof_marker, h, w, samps, qtids, qts) -> bytearray:
    """SOI/APP0/DQT(s)/SOF — shared by every _component_grids encoder;
    only the SOF marker byte (0xC0/0xC2/0xC9/0xCA) differs."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, _JFIF_APP0)
    out += _seg(0xDB, b"\x00" + bytes(qts[0][ZIGZAG].tolist()))
    if len(qts) > 1:
        out += _seg(0xDB, b"\x01" + bytes(qts[1][ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(samps))
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, qtids[ci]])
    out += _seg(sof_marker, sof)
    return out


def _sos_seg(cids, ss, se, ah, al, entropy: bytes) -> bytes:
    hdr = bytes([len(cids)]) + b"".join(
        bytes([cid, 0x00]) for cid in cids
    ) + bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, hdr) + entropy


def _component_grids(arr: np.ndarray, quality: int, sampling: str):
    """Shared encoder prep: per-component MCU-padded coefficient grids in
    raster block order (stride mcux*sh — identical layout to the
    decoder's grids). The FULL-RES plane is padded to the MCU extent
    first, then block-mean subsampled (the baseline encoder's order, so
    coefficients match it exactly). Returns
    (h, w, samps, qtids, qts, zz, mcux, mcuy, hmax, vmax)."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[-1] == 3 and a.shape[0] != 3:
        a = np.transpose(a, (2, 0, 1))
    if np.issubdtype(a.dtype, np.floating):
        raise ValueError("this encoder takes uint8 input")
    if a.ndim == 2:
        h, w = a.shape
        samps = [(1, 1)]
        qtids = [0]
        qts = [_quality_qt(quality)]
        planes = [a.astype(np.float64)]
    else:
        assert a.ndim == 3 and a.shape[0] == 3, "color input must be 3-band"
        if sampling not in SAMPLING_LAYOUTS:
            raise ValueError("sampling must be one of "
                             "'444','420','422','440','411'")
        h, w = a.shape[1:]
        sh0, sv0 = SAMPLING_LAYOUTS[sampling]
        samps = [(sh0, sv0), (1, 1), (1, 1)]
        qtids = [0, 1, 1]
        qts = [_quality_qt(quality), _chroma_qt(quality)]
        ycc = _rgb_to_ycbcr(a.astype(np.float64))
        planes = list(ycc)
    hmax = max(s for s, _ in samps)
    vmax = max(s for _, s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zz = []
    fth, ftw = mcuy * vmax * 8, mcux * hmax * 8
    for ci, (sh, sv) in enumerate(samps):
        pl = planes[ci]
        if pl.shape != (fth, ftw):
            pl = np.pad(pl, ((0, fth - pl.shape[0]), (0, ftw - pl.shape[1])),
                        mode="edge")
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            pl = pl.reshape(fth // ry, ry, ftw // rx, rx).mean(axis=(1, 3))
        zz.append(_quantized_zigzag(pl, qts[qtids[ci]]))
    return h, w, samps, qtids, qts, zz, mcux, mcuy, hmax, vmax


def jpeg_encode_progressive(arr: np.ndarray, *, quality: int = 95,
                            sampling: str = "420") -> bytes:
    """Encode uint8 grayscale (2D) or RGB (3-band) as a PROGRESSIVE JPEG
    (SOF2) with both spectral selection and successive approximation —
    the scan script is DC(Al=1) → DC refine → per-component AC bands
    (1-5, 6-63 at Al=2) → AC refine (Al=2→1) → AC refine (Al=1→0), so a
    conforming decoder reconstructs the EXACT same coefficients as the
    baseline encoding (test_jpeg pins that equivalence against
    jpeg_decode). Primary role: exercising/validating the progressive
    decode path plus compatibility output; the corpus hot path stays
    baseline. Float tiles: use baseline jpeg_encode (APP15 sidecar)."""
    (h, w, samps, qtids, qts, zz, mcux, mcuy, hmax, vmax) = _component_grids(
        arr, quality, sampling)
    ncomp = len(samps)

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_bits, ac_vals = _flat_ac_bits_vals()
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    def dims(ci):
        sh, sv = samps[ci]
        return _comp_block_dims((0, 0, sh, sv), mcux, w, h, hmax, vmax)

    sos = _sos_seg
    out = _frame_headers(0xC2, h, w, samps, qtids, qts)  # SOF2
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # ---- scan 1: DC first pass, Al=1, interleaved over all components
    bw_ = _BitWriter()
    preds = [0] * ncomp
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci in range(ncomp):
            sh, sv = samps[ci]
            bw_c = mcux * sh
            for v in range(sv):
                for u in range(sh):
                    bi = (my * sv + v) * bw_c + (mx * sh + u)
                    val = int(zz[ci][bi][0]) >> 1  # point transform
                    diff = val - preds[ci]
                    preds[ci] = val
                    cat = _category(diff)
                    code, ln = dc_codes[cat]
                    bw_.write(code, ln)
                    _emit_vli(bw_, diff, cat)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1, bw_.flush())

    # ---- scan 2: DC refinement, Ah=1 Al=0 (one raw bit per block)
    bw_ = _BitWriter()
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci in range(ncomp):
            sh, sv = samps[ci]
            bw_c = mcux * sh
            for v in range(sv):
                for u in range(sh):
                    bi = (my * sv + v) * bw_c + (mx * sh + u)
                    bw_.write(int(zz[ci][bi][0]) & 1, 1)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0, bw_.flush())

    # ---- AC scans per component: spectral bands at Al=2, then two
    # successive-approximation refinement passes over the full band
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss, se, 0, 2,
                       _ac_first_scan(zz[ci], dims(ci), ss, se, 2, ac_codes))
    for ah in (2, 1):
        for ci in range(ncomp):
            out += sos([ci + 1], 1, 63, ah, ah - 1,
                       _ac_refine_scan(zz[ci], dims(ci), 1, 63, ah - 1,
                                       ac_codes))
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_arithmetic(arr: np.ndarray, *, quality: int = 95,
                           sampling: str = "420") -> bytes:
    """Encode uint8 grayscale (2D) or RGB (3-band) as a SEQUENTIAL
    ARITHMETIC-coded JPEG (SOF9): same DCT/quantization as baseline, QM
    entropy coding (qmcoder.py) instead of Huffman — typically 5-10%
    smaller. Emits an explicit DAC segment with the default conditioning
    (L=0, U=1, Kx=5). Decode is pinned coefficient-exact against the
    Huffman baseline in test_jpeg; see qmcoder.py's docstring for the
    validation scope (roundtrip + cross-path exactness; no
    arithmetic-capable foreign codec exists in this environment)."""
    from .qmcoder import ACModel, DCModel, QMEncoder

    (h, w, samps, qtids, qts, zz, mcux, mcuy, hmax, vmax) = _component_grids(
        arr, quality, sampling)
    ncomp = len(samps)
    enc = QMEncoder()
    dcm, acm = DCModel(), ACModel()  # both tables id 0, shared by comps
    preds = [0] * ncomp
    ctxs = [0] * ncomp

    def code_block(ci, bi):
        blk = zz[ci][bi]
        diff = int(blk[0]) - preds[ci]
        preds[ci] = int(blk[0])
        ctxs[ci] = dcm.encode(enc, diff, ctxs[ci])
        acm.encode_block(enc, blk)

    comps_like = [(ci + 1, 0, sh, sv) for ci, (sh, sv) in enumerate(samps)]
    for _unit, ci, bi in _scan_block_order(list(range(ncomp)), comps_like,
                                           mcux, mcuy, w, h, hmax, vmax):
        code_block(ci, bi)
    entropy = enc.flush()

    out = _frame_headers(0xC9, h, w, samps, qtids, qts)  # SOF9
    # DAC: DC table 0 conditioning (U<<4)|L = 0x10; AC table 0 Kx = 5
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
    out += _sos_seg(list(range(1, ncomp + 1)), 0, 63, 0, 0, entropy)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_arithmetic_progressive(arr: np.ndarray, *,
                                       quality: int = 95,
                                       sampling: str = "420") -> bytes:
    """Encode uint8 grayscale (2D) or RGB (3-band) as a PROGRESSIVE
    ARITHMETIC-coded JPEG (SOF10): the progressive encoder's scan script
    (DC Al=1 → DC refine → AC bands 1-5/6-63 at Al=2 → AC refine 2→1 →
    1→0) with QM entropy coding per T.81 G.1.3 — statistics reset at
    every scan, as the decoder requires. Decode is pinned
    coefficient-exact against the baseline encoding in test_jpeg."""
    from .qmcoder import ACModel, DCModel, QMEncoder

    (h, w, samps, qtids, qts, zz, mcux, mcuy, hmax, vmax) = _component_grids(
        arr, quality, sampling)
    ncomp = len(samps)
    comps_like = [(ci + 1, 0, sh, sv) for ci, (sh, sv) in enumerate(samps)]

    def order(cis):
        return _scan_block_order(cis, comps_like, mcux, mcuy, w, h,
                                 hmax, vmax)

    sos_seg = _sos_seg
    out = _frame_headers(0xCA, h, w, samps, qtids, qts)  # SOF10
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # default DAC

    all_cids = list(range(1, ncomp + 1))
    # DC first pass (Al=1, interleaved, point-transformed diffs)
    enc = QMEncoder()
    dcm = DCModel()
    preds = [0] * ncomp
    ctxs = [0] * ncomp
    for _u, ci, bi in order(list(range(ncomp))):
        v = int(zz[ci][bi][0]) >> 1
        ctxs[ci] = dcm.encode(enc, v - preds[ci], ctxs[ci])
        preds[ci] = v
    out += sos_seg(all_cids, 0, 0, 0, 1, enc.flush())
    # DC refinement (one fixed-state bit per block)
    enc = QMEncoder()
    for _u, ci, bi in order(list(range(ncomp))):
        enc.encode_fixed(int(zz[ci][bi][0]) & 1)
    out += sos_seg(all_cids, 0, 0, 1, 0, enc.flush())
    # AC spectral bands at Al=2, per component
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            enc = QMEncoder()
            acm = ACModel()
            for _u, _c, bi in order([ci]):
                acm.encode_block(enc, zz[ci][bi], ss=ss, se=se, al=2)
            out += sos_seg([ci + 1], ss, se, 0, 2, enc.flush())
    # AC successive-approximation refinements
    for ah in (2, 1):
        for ci in range(ncomp):
            enc = QMEncoder()
            acm = ACModel()
            for _u, _c, bi in order([ci]):
                acm.encode_refine(enc, zz[ci][bi], ss=1, se=63, al=ah - 1)
            out += sos_seg([ci + 1], 1, 63, ah, ah - 1, enc.flush())
    out += b"\xff\xd9"
    return bytes(out)


def _ac_first_scan(zzc, dims, ss, se, al, ac_codes) -> bytes:
    """Entropy data of one first-pass AC scan (T.81 G.1.2.2): values are
    point-transformed (truncate toward zero) by 2^Al; all-zero bands
    accumulate EOB runs (EOBn symbols carry the run length)."""
    bh_s, bw_s, bw_c = dims
    bw_ = _BitWriter()
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac_codes[n << 4]
            bw_.write(code, ln)
            bw_.write(eobrun - (1 << n), n)
            eobrun = 0

    for u in range(bh_s * bw_s):
        r_, c_ = divmod(u, bw_s)
        blk = zzc[r_ * bw_c + c_]
        band = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            band.append(v >> al if v >= 0 else -((-v) >> al))
        last = -1
        for i, t in enumerate(band):
            if t:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        run = 0
        for t in band[: last + 1]:
            if t == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw_.write(code, ln)
                run -= 16
            cat = _category(t)
            code, ln = ac_codes[(run << 4) | cat]
            bw_.write(code, ln)
            _emit_vli(bw_, t, cat)
            run = 0
        if last < se - ss:
            eobrun = 1
    flush_eobrun()
    return bw_.flush()


def _ac_refine_scan(zzc, dims, ss, se, al, ac_codes) -> bytes:
    """Entropy data of one AC successive-approximation refinement scan
    (T.81 G.1.2.3). The bit order is dictated by the decoder's traversal,
    so this emits exactly that read sequence: per newly-significant
    coefficient (point-transformed magnitude exactly 1) a run symbol
    counting ZERO-history positions + its sign bit, with one correction
    bit interleaved for every already-significant coefficient the
    decoder advances across; blocks (or block tails) without
    newly-significant coefficients join an EOB run whose correction bits
    ride immediately after the EOBn code."""
    bh_s, bw_s, bw_c = dims
    bw_ = _BitWriter()
    eobrun = 0
    eob_bits: list[int] = []  # correction bits owned by the pending run

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac_codes[n << 4]
            bw_.write(code, ln)
            bw_.write(eobrun - (1 << n), n)
            eobrun = 0
            for b in eob_bits:
                bw_.write(b, 1)
            eob_bits.clear()

    nband = se - ss + 1
    for u in range(bh_s * bw_s):
        r_, c_ = divmod(u, bw_s)
        blk = zzc[r_ * bw_c + c_]
        vals = [int(blk[k]) for k in range(ss, se + 1)]
        t = [abs(v) >> al for v in vals]
        newly = [i for i, x in enumerate(t) if x == 1]
        if not newly:
            # EOB block: every history coefficient still gets one bit
            eobrun += 1
            eob_bits.extend(x & 1 for x in t if x > 1)
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        k = 0  # current band-relative position of the decoder
        for pos in newly:
            while True:
                seg = [i for i in range(k, pos) if t[i] == 0]
                if len(seg) <= 15:
                    break
                # ZRL: decoder skips 16 zero-history positions, reading a
                # correction bit at each nonzero it crosses
                code, ln = ac_codes[0xF0]
                bw_.write(code, ln)
                z16 = seg[15]
                for i in range(k, z16):
                    if t[i] > 1:
                        bw_.write(t[i] & 1, 1)
                k = z16 + 1
            r = sum(1 for i in range(k, pos) if t[i] == 0)
            code, ln = ac_codes[(r << 4) | 1]
            bw_.write(code, ln)
            bw_.write(1 if vals[pos] > 0 else 0, 1)
            for i in range(k, pos):
                if t[i] > 1:
                    bw_.write(t[i] & 1, 1)
            k = pos + 1
        if k < nband:
            # trailing region: consumed by the decoder's EOB logic
            eobrun += 1
            eob_bits.extend(t[i] & 1 for i in range(k, nband) if t[i] > 1)
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()
    return bw_.flush()


class _BitReader:
    """Bit reader over unstuffed entropy data with 16-bit peek."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte : byte + 4]
        acc = int.from_bytes(chunk.ljust(4, b"\xff"), "big")
        return (acc >> (16 - (self.pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        v = self.peek16() >> (16 - n) if n else 0
        self.pos += n
        return v

    def skip(self, n: int) -> None:
        self.pos += n


def _extend(v: int, cat: int) -> int:
    """Magnitude bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_one_block(br, zz_row, pred, dc_tab, ac_tab):
    """Entropy-decode one block into zz_row; returns the new predictor."""
    dc_sym, dc_len = dc_tab
    ac_sym, ac_len = ac_tab
    win = br.peek16()
    cat = int(dc_sym[win])
    if int(dc_len[win]) == 0:  # unmapped window: truncated/corrupt data
        raise AssertionError("truncated or corrupt entropy data")
    br.skip(int(dc_len[win]))
    diff = _extend(br.take(cat), cat) if cat else 0
    pred += diff
    zz_row[0] = pred
    k = 1
    while k < 64:
        win = br.peek16()
        rs = int(ac_sym[win])
        if int(ac_len[win]) == 0:
            raise AssertionError("truncated or corrupt entropy data")
        br.skip(int(ac_len[win]))
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        run, cat = rs >> 4, rs & 0xF
        k += run
        zz_row[k] = _extend(br.take(cat), cat)
        k += 1
    return pred


def _comp_block_dims(comp, mcux, w, h, hmax, vmax):
    """True (non-MCU-padded) block-grid dims + the MCU-padded row stride
    for one component (T.81 A.2.2: ceil sizes from the sampling ratio)."""
    _, _, sh, sv = comp
    cw = (w * sh + hmax - 1) // hmax
    ch = (h * sv + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8, mcux * sh


def _scan_block_order(idxs, comps, mcux, mcuy, w, h, hmax, vmax):
    """Yield (unit, ci, bi) in scan order — the ONE traversal shared by
    every sequential entropy mode. Multi-component scans interleave
    sh×sv blocks per component in MCU order (unit = MCU index, T.81
    A.2.3); a single-component scan is non-interleaved — one data unit
    per true raster block (unit = block index), whatever the declared
    sampling factors. Restart intervals count units."""
    if len(idxs) > 1:
        for mi in range(mcux * mcuy):
            my, mx = divmod(mi, mcux)
            for ci in idxs:
                _, _, sh, sv = comps[ci]
                bw_c = mcux * sh  # component blocks per row
                for v in range(sv):
                    for u in range(sh):
                        yield mi, ci, (my * sv + v) * bw_c + (mx * sh + u)
    else:
        ci = idxs[0]
        bh_s, bw_s, bw_c = _comp_block_dims(comps[ci], mcux, w, h,
                                            hmax, vmax)
        for u in range(bh_s * bw_s):
            r_, c_ = divmod(u, bw_s)
            yield u, ci, r_ * bw_c + c_


def _apply_sequential_scan(scan, comps, grids, mcux, mcuy, w, h, hmax, vmax):
    """Apply one baseline-sequential scan to the coefficient grids.

    Baseline files usually hold ONE interleaved scan, but
    one-scan-per-component files are legal and decode here too
    (traversal semantics in _scan_block_order)."""
    (cids, stabs, _ss, _se, _ah, _al, body, rst_marks, restart,
     sdc, sac) = scan[:11]
    br = _BitReader(body)
    rst_iter = iter(rst_marks)
    next_rst = next(rst_iter, None)
    idxs = []
    for cid in cids:
        idxs.append(next(i for i, c in enumerate(comps) if c[0] == cid))
    ctabs = {
        ci: (sdc[stabs[comps[ci][0]][0]], sac[stabs[comps[ci][0]][1]])
        for ci in idxs
    }
    preds = {ci: 0 for ci in idxs}
    last_unit = 0
    for unit, ci, bi in _scan_block_order(idxs, comps, mcux, mcuy, w, h,
                                          hmax, vmax):
        if unit != last_unit and restart and unit % restart == 0 \
                and next_rst is not None:
            br.pos = next_rst  # byte-aligned restart
            next_rst = next(rst_iter, None)
            preds = {c2: 0 for c2 in idxs}
        last_unit = unit
        preds[ci] = _decode_one_block(
            br, grids[ci][bi], preds[ci], ctabs[ci][0], ctabs[ci][1],
        )


def _apply_arith_scan(scan, comps, grids, mcux, mcuy, w, h, hmax, vmax):
    """Apply one ARITHMETIC-coded scan — sequential (SOF9: Ss=0, Se=63,
    Ah=Al=0, so the block decodes DC then the full AC band) or
    progressive (SOF10, T.81 G.1.3: DC first scans run the DC model on
    point-transformed diffs, DC refinement is one fixed-state bit per
    block, AC first scans run the band-limited AC model, AC refinement
    uses the G.1.3.3 per-position contexts with the EOBx rule) — to the
    coefficient grids with the QM decoder + T.81 F.1.4 statistical
    models (qmcoder.py). Statistics areas are per referenced table id
    (shared across components in the scan, as the spec requires); the
    DC conditioning context and predictor are per component. An RSTn
    boundary re-initializes the coder AND the statistics."""
    from .qmcoder import ACModel, DCModel, QMDecoder

    (cids, stabs, ss, se, ah, al, body, rst_marks, restart,
     _sdc, _sac) = scan[:11]
    dc_cond, ac_cond = scan[11], scan[12]
    idxs = []
    for cid in cids:
        idxs.append(next(i for i, c in enumerate(comps) if c[0] == cid))

    segments = [0] + list(rst_marks)  # byte offsets of coder segments
    seg_no = 0

    def fresh():
        dms, ams = {}, {}
        for ci in idxs:
            dtbl, atbl = stabs[comps[ci][0]]
            if ss == 0 and ah == 0 and dtbl not in dms:
                L, U = dc_cond.get(dtbl, (0, 1))
                dms[dtbl] = DCModel(L, U)
            if se > 0 and atbl not in ams:
                ams[atbl] = ACModel(ac_cond.get(atbl, 5))
        return (QMDecoder(body[segments[seg_no]:]), dms, ams,
                {ci: 0 for ci in idxs}, {ci: 0 for ci in idxs})

    dec, dcms, acms, preds, ctxs = fresh()
    p1 = 1 << al

    def decode_block(ci, zz):
        dtbl, atbl = stabs[comps[ci][0]]
        if ss == 0:
            if ah == 0:  # DC (first pass): point-transformed diff coding
                diff, ctxs[ci] = dcms[dtbl].decode(dec, ctxs[ci])
                preds[ci] += diff
                zz[0] = preds[ci] << al
            elif dec.decode_fixed():  # DC refinement bit
                zz[0] = int(zz[0]) | p1
        if se > 0:
            if ah == 0:
                acms[atbl].decode_block(dec, zz, ss=max(ss, 1), se=se,
                                        al=al)
            else:
                acms[atbl].decode_refine(dec, zz, ss=ss, se=se, al=al)

    last_unit = 0
    for unit, ci, bi in _scan_block_order(idxs, comps, mcux, mcuy, w, h,
                                          hmax, vmax):
        if unit != last_unit and restart and unit % restart == 0 \
                and seg_no + 1 < len(segments):
            seg_no += 1
            dec, dcms, acms, preds, ctxs = fresh()
        last_unit = unit
        decode_block(ci, grids[ci][bi])


def _apply_progressive_scan(scan, comps, grids, mcux, mcuy, w, h, hmax, vmax):
    """Apply one progressive scan (T.81 G.2) to the coefficient grids.

    DC scans (Ss=0) run interleaved in MCU order (or in component raster
    order when the scan holds one component); AC scans hold exactly one
    component and traverse its own block raster. Ah=0 scans deliver new
    (point-transformed) values; Ah>0 scans deliver one successive-
    approximation bit per coefficient (G.1.2.3 refinement with EOB runs).
    """
    (cids, stabs, ss, se, ah, al, body, rst_marks, restart,
     sdc, sac) = scan[:11]
    br = _BitReader(body)
    rst_iter = iter(rst_marks)
    next_rst = next(rst_iter, None)
    idxs = []
    for cid in cids:
        idxs.append(next(i for i, c in enumerate(comps) if c[0] == cid))
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0

    def huff(tab):
        sym, ln = tab
        win = br.peek16()
        if int(ln[win]) == 0:
            raise AssertionError("truncated or corrupt entropy data")
        br.skip(int(ln[win]))
        return int(sym[win])

    def refine_nonzero(zz, k):
        # correction bit for an already-nonzero coefficient (G.1.2.3):
        # 1 -> grow the magnitude by 1<<Al if that bit isn't set yet
        if br.take(1) and not (int(zz[k]) & p1):
            zz[k] += p1 if zz[k] >= 0 else m1

    if ss == 0:  # ---- DC scan ----
        assert se == 0, "DC progressive scan must have Se=0"
        preds = {ci: 0 for ci in idxs}
        dctabs = {ci: sdc.get(stabs[comps[ci][0]][0]) for ci in idxs}

        def dc_block(ci, zz):
            if ah == 0:
                cat = huff(dctabs[ci])
                diff = _extend(br.take(cat), cat) if cat else 0
                preds[ci] += diff
                zz[0] = preds[ci] << al
            elif br.take(1):
                zz[0] = int(zz[0]) | p1

        if len(idxs) > 1:  # interleaved MCU traversal
            for mi in range(mcux * mcuy):
                if restart and mi and mi % restart == 0 \
                        and next_rst is not None:
                    br.pos = next_rst
                    next_rst = next(rst_iter, None)
                    preds = {ci: 0 for ci in idxs}
                my, mx = divmod(mi, mcux)
                for ci in idxs:
                    _, _, sh, sv = comps[ci]
                    bw_c = mcux * sh
                    for v in range(sv):
                        for u in range(sh):
                            bi = (my * sv + v) * bw_c + (mx * sh + u)
                            dc_block(ci, grids[ci][bi])
        else:
            ci = idxs[0]
            bh_s, bw_s, bw_c = _comp_block_dims(comps[ci], mcux, w, h,
                                                hmax, vmax)
            for u in range(bh_s * bw_s):
                if restart and u and u % restart == 0 \
                        and next_rst is not None:
                    br.pos = next_rst
                    next_rst = next(rst_iter, None)
                    preds = {ci: 0 for ci in idxs}
                r_, c_ = divmod(u, bw_s)
                dc_block(ci, grids[ci][r_ * bw_c + c_])
        return

    # ---- AC scan: exactly one component, own raster order ----
    assert len(idxs) == 1, "progressive AC scan must hold one component"
    ci = idxs[0]
    actab = sac[stabs[comps[ci][0]][1]]
    bh_s, bw_s, bw_c = _comp_block_dims(comps[ci], mcux, w, h, hmax, vmax)

    def ac_first(zz):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = huff(actab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.take(r)
                break
            k += r
            if k > se:
                break  # corrupt stream guard
            zz[k] = _extend(br.take(s), s) << al
            k += 1

    def ac_refine(zz):
        nonlocal eobrun
        k = ss
        if not eobrun:
            while k <= se:
                rs = huff(actab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.take(r)
                        break
                    val = 0  # ZRL: skip 16 zero-history positions
                else:
                    # newly-significant coefficient: sign bit, value ±1<<Al
                    val = p1 if br.take(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun:
            # EOB-run block: correction bits for remaining history coeffs
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(zz, k)
                k += 1
            eobrun -= 1

    apply = ac_first if ah == 0 else ac_refine
    for u in range(bh_s * bw_s):
        if restart and u and u % restart == 0 and next_rst is not None:
            br.pos = next_rst
            next_rst = next(rst_iter, None)
            eobrun = 0
        r_, c_ = divmod(u, bw_s)
        apply(grids[ci][r_ * bw_c + c_])


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode any T.81 DCT JPEG (SOF0/1/2/9/10, any encoder):
    grayscale returns (h, w) uint8 — or
    float32 when the stream carries this codec's APP15 rescale sidecar;
    color returns (3, h, w) uint8 RGB (the corpus's multiband
    convention) for any integral-ratio sampling layout (4:4:4, 4:2:0,
    4:2:2, 4:4:0, 4:1:1, ...). Every T.81 DCT entropy/scan mode decodes
    (SOF0/1/2/9/10); lossless/hierarchical streams and fractional-ratio
    layouts raise NotImplementedError."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (missing SOI)"
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, tuple] = {}
    ac_tabs: dict[int, tuple] = {}
    h = w = None
    comps: list = []          # (component id, quant table id) in SOF order
    restart = 0
    rescale = None
    progressive = False
    arith = False
    adobe_transform = None
    dc_cond: dict = {}  # DAC conditioning: table id -> (L, U)
    ac_cond: dict = {}  # DAC conditioning: table id -> Kx
    scans: list = []  # (comp ids in scan order, tabs, ss, se, ah, al,
    #                    body, rst bit marks, restart interval)
    while pos < len(data):
        if data[pos] != 0xFF:
            # tolerate truncation after a complete scan (e.g. a stream
            # whose trailing EOI was cut off): decode what we have
            if scans:
                break
            raise AssertionError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker id — skip them (some encoders align segments this way)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        assert pos + 1 < len(data), "truncated JPEG: stream ends in fill bytes"
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # length-less standalone markers (TEM, stray RSTn) are legal
            # between segments — skip the 2 marker bytes, no length field
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                assert pq == 0, "only 8-bit quantization tables supported"
                tbl = np.frombuffer(payload, dtype=np.uint8,
                                    count=64, offset=off + 1)
                # DQT stores the table in zigzag scan order -> natural
                qts[tq] = tbl.astype(np.int64)[UNZIGZAG]
                off += 65
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9 sequential
            # arithmetic, SOF10 progressive arithmetic
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload)
            assert prec == 8, "only 8-bit precision supported"
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 1-component (grayscale) or 3-component JPEG "
                    "is supported"
                )
            for ci in range(ncomp):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, tq, samp >> 4, samp & 0xF))
            hs = [c[2] for c in comps]
            vs = [c[3] for c in comps]
            hm, vm = max(hs), max(vs)
            # any T.81-legal layout whose upsample ratios are integral
            # (covers 4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1); fractional
            # ratios (e.g. 3:2) would need interpolating upsample
            ok = (
                all(1 <= x <= 4 for x in hs + vs)
                and all(hm % x == 0 for x in hs)
                and all(vm % x == 0 for x in vs)
                and sum(a * b for a, b in zip(hs, vs)) <= 10  # B.2.3 limit
            )
            if not ok:
                raise NotImplementedError(
                    "unsupported sampling layout (non-integral chroma "
                    "upsample ratio or blocks-per-MCU > 10)"
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only DCT JPEG is supported — baseline-sequential, "
                "progressive, and arithmetic (sequential + progressive); "
                "lossless and hierarchical frames are not"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            off = 0
            while off + 1 < len(payload):
                tctb, cs = payload[off], payload[off + 1]
                if tctb >> 4 == 0:
                    dc_cond[tctb & 0xF] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    ac_cond[tctb & 0xF] = cs  # Kx
                off += 2
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                n = sum(bits)
                vals = list(payload[off + 17 : off + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_lut(bits, vals)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", payload)
        elif marker == 0xEF and payload[:4] == _APP15_TAG:
            rescale = struct.unpack_from("<dd", payload, 4)
        elif marker == 0xEE and payload[:5] == b"Adobe" and len(payload) >= 12:
            adobe_transform = payload[11]  # 0=RGB/unknown, 1=YCbCr, 2=YCCK
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_cids = []
            stabs: dict = {}
            for ci in range(ns):
                cs, tt = payload[1 + 2 * ci], payload[2 + 2 * ci]
                scan_cids.append(cs)
                stabs[cs] = (tt >> 4, tt & 0xF)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            # entropy data runs until the next marker that isn't
            # stuffing/RSTn; FF 00 zero-byte stuffing applies to BOTH
            # entropy modes (T.81; jdarith's 'discard stuffed zero
            # byte'); RSTn positions are recorded as bit marks
            # (Huffman) or byte offsets (arithmetic)
            body = bytearray()
            rst_bit_marks = []
            p = pos
            while p < len(data) - 1:
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        body.append(0xFF)  # un-stuff
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn: reset boundary
                        rst_bit_marks.append(
                            len(body) if arith else len(body) * 8)
                        p += 2
                        continue
                    break  # EOI or next segment
                body.append(b)
                p += 1
            if p == len(data) - 1 and data[p] != 0xFF:
                # truncated stream (EOI cut off): the final byte is
                # entropy data — keep it, the scan itself is complete
                body.append(data[p])
                p += 1
            pos = p
            scans.append((
                scan_cids, stabs, ss, se, ahal >> 4, ahal & 0xF,
                bytes(body), rst_bit_marks, restart,
                dict(dc_tabs), dict(ac_tabs),
                dict(dc_cond), dict(ac_cond),
            ))
        # other APPn/COM segments: skipped
    assert scans and h is not None, "no scan found"

    ncomp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component block grids (MCU-aligned)
    grids = [
        np.zeros((mcuy * c[3] * mcux * c[2], 64), dtype=np.int64)
        for c in comps
    ]
    if arith:
        applier = _apply_arith_scan
    elif progressive:
        applier = _apply_progressive_scan
    else:
        applier = _apply_sequential_scan
    for scan in scans:
        applier(scan, comps, grids, mcux, mcuy, w, h, hmax, vmax)

    planes = []
    for ci, (cid, tq, sh, sv) in enumerate(comps):
        bh_c, bw_c = mcuy * sv, mcux * sh
        coeffs = (
            grids[ci][:, UNZIGZAG].reshape(-1, 8, 8) * qts[tq].reshape(8, 8)
        )
        blocks = np.einsum("ji,njk,kl->nil", _T, coeffs, _T) + 128.0
        full = (
            blocks.reshape(bh_c, bw_c, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh_c * 8, bw_c * 8)
        )
        # crop to the component's true extent, then upsample to full size
        ch = (h * sv + vmax - 1) // vmax
        cw = (w * sh + hmax - 1) // hmax
        plane = full[:ch, :cw]
        if sv != vmax or sh != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1
            )
        planes.append(plane[:h, :w])
    if ncomp == 1:
        img = np.clip(np.rint(planes[0]), 0, 255)
        if rescale is not None:
            lo, scale = rescale
            return (img * scale + lo).astype(np.float32)
        return img.astype(np.uint8)
    if adobe_transform == 2:
        raise NotImplementedError("Adobe YCCK color transform not supported")
    # color convention (the libjpeg rule): Adobe APP14 transform byte wins;
    # otherwise component ids 'R','G','B' mean the planes are raw RGB
    rgb_direct = adobe_transform == 0 or (
        adobe_transform is None and [c[0] for c in comps] == [0x52, 0x47, 0x42]
    )
    if rgb_direct:
        rgb = np.stack(planes)
    else:
        rgb = _ycbcr_to_rgb(np.stack(planes))
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
