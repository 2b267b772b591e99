"""Independent oracle generator for the hash-family queries.

xxhash64 has no DuckDB twin, so `doc_minhash_lsh`, `doc_simhash`, `ann_lsh`
and `tile_resize` were rows-only checks in round 1. This module recomputes
their expected outputs WITHOUT Spark: a from-scratch pure-Python XXH64
(public algorithm, Yann Collet; matches Spark's `F.xxhash64` semantics —
default seed 42, children chained as running seeds, integral types hashed
as 8-byte longs) plus plain-Python reimplementations of the MinHash/LSH,
SimHash and hyperplane-LSH pipelines over the sf parquet tables. The
driver's DuckDB oracle then just SELECTs the committed expected parquet.

Usage: python tools/oracle_hashes.py [sf_dir] [outdir]
  (defaults: /root/testdata/sf0.01  data/oracles/sf0_01)
"""

from __future__ import annotations

import hashlib
import math
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ---------------------------------------------------------------------------
# XXH64 (xxHash, 64-bit variant) — public domain algorithm, implemented from
# the published spec. Spark's XxHash64 expression uses seed 42 and, for
# multi-child calls, feeds each child's hash in as the next child's seed.
# ---------------------------------------------------------------------------

_P1 = 11400714785074694791  # 0x9E3779B185EBCA87
_P2 = 14029467366897019727  # 0xC2B2AE3D27D4EB4F
_P3 = 1609587929392839161   # 0x165667B19E3779F9
_P4 = 9650029242287828579   # 0x85EBCA77C2B2AE63
_P5 = 2870177450012600261   # 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while pos + 32 <= n:
            (l1, l2, l3, l4) = struct.unpack_from("<QQQQ", data, pos)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        (l,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, l)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        (w,) = struct.unpack_from("<I", data, pos)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the specialized 8-byte path (== xxh64 of the
    little-endian long)."""
    return xxh64(struct.pack("<q", _signed(value & _M)), seed)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the specialized 4-byte path — IntegerType
    children hash as 4 bytes, NOT promoted to long."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _avalanche(h)


class Long(int):
    """Marker for LongType children of spark_xxhash64."""


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*children, seed: int = 42) -> int:
    """F.xxhash64(c1, c2, ...): running hash threads through the children.
    str children hash their UTF-8 bytes; plain ints are IntegerType (4-byte
    hashInt, like F.lit(i)); wrap in Long for LongType children."""
    h = seed
    for c in children:
        if isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        elif isinstance(c, Long):
            h = xxh64_long(int(c), h)
        elif isinstance(c, (int, np.integer)):
            h = xxh64_int(int(c), h)
        else:
            raise TypeError(type(c))
    return h


# ---------------------------------------------------------------------------
# pipeline reimplementations (plain Python — no Spark)
# ---------------------------------------------------------------------------


def _tokens(text: str) -> list[str]:
    """F.split(F.trim(text), ' ') semantics: split on single spaces,
    preserving empty strings from runs of spaces."""
    return text.strip().split(" ")


def _shingles(toks: list[str], n: int = 3) -> list[str]:
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def minhash_lsh_expected(docs, n=3, k=32, bands=8):
    """(doc_a, doc_b, est_jaccard) — mirror of dedup.minhash_lsh_candidates."""
    r = k // bands
    sigs: dict[int, list[int]] = {}
    for doc_id, text in docs:
        toks = _tokens(text)
        if len(toks) < n:
            continue
        sh = _shingles(toks, n)
        if not sh:
            continue
        sig = [(1 << 63) - 1] * k
        for s in sh:
            for i in range(k):
                h = _signed(spark_xxhash64(s, i))
                if h < sig[i]:
                    sig[i] = h
        sigs[doc_id] = sig
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for bi in range(bands):
            key_str = ",".join(str(sig[bi * r + j]) for j in range(r))
            bucket = _signed(spark_xxhash64(key_str))
            buckets.setdefault((bi, bucket), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        match = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        rows.append((a, b, round(match / float(k), 6)))
    return rows


def simhash_expected(docs, bits=64):
    """(doc_id, simhash) — mirror of dedup.simhash."""
    rows = []
    for doc_id, text in docs:
        toks = list(dict.fromkeys(_tokens(text)))  # array_distinct keeps order
        hashes = [_signed(spark_xxhash64(t)) for t in toks]
        packed = 0
        for i in range(bits):
            vote = sum(1 if (h >> i) & 1 else -1 for h in hashes)
            if vote > 0:
                packed |= 1 << i
        rows.append((doc_id, _signed(packed)))
    return rows


def lsh_ann_expected(emb, nplanes=8, query_max_id=5, threshold=0.25):
    """(query_id, neighbor_id, cos_r) — mirror of similarity.lsh_ann."""
    dims = len(emb[0][1])
    # plane sign matrix: ±1 from xxhash64(lit(i), d) & 1
    signs = [
        [1.0 if spark_xxhash64(i, d) & 1 else -1.0 for d in range(dims)]
        for i in range(nplanes)
    ]

    def bucket(v):
        b = 0
        for i in range(nplanes):
            acc = 0.0
            for d in range(dims):  # sequential fold, like F.aggregate
                acc += float(v[d]) * signs[i][d]
            if acc > 0:
                b |= 1 << i
        return b

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    buckets = [(vid, v, bucket(v)) for vid, v in emb]
    qs = [(vid, v, bk) for vid, v, bk in buckets if vid < query_max_id]
    rows = []
    for qid, qv, qb in qs:
        for nid, nv, nb in buckets:
            if nb != qb or nid == qid:
                continue
            cos = dot(qv, nv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(nv, nv)))
            if cos >= threshold:
                rows.append((qid, nid, round(cos, 6)))
    return rows


def tile_resize_expected(fixture_dir, out=8):
    """(image_id, out_w, out_h, payload_md5) — independent blockmean."""
    from python_rasterstats_spark import codecs as C

    t = pq.read_table(os.path.join(fixture_dir, "tiles.parquet")).to_pylist()
    rows = []
    for row in t:
        arr = np.asarray(C.decode_tile(bytes(row["bytes"]), row["fmt"]),
                         dtype=np.float64)
        if arr.ndim == 3:
            arr = arr[0]
        h, w = arr.shape
        ph, pw = (-h) % out, (-w) % out
        if ph or pw:
            arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
        hb, wb = arr.shape[0] // out, arr.shape[1] // out
        small = arr.reshape(out, hb, out, wb).mean(axis=(1, 3)).astype(np.float32)
        md5 = hashlib.md5(C.encode_tile(small, "npy")).hexdigest()
        rows.append((row["image_id"], out, out, md5))
    return rows


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def main(sf_dir="/root/testdata/sf0.01", outdir=None):
    outdir = outdir or os.path.join(REPO, "data", "oracles", "sf0_01")
    os.makedirs(outdir, exist_ok=True)
    docs_t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    docs = list(zip(docs_t["doc_id"].to_pylist(), docs_t["text"].to_pylist()))
    emb_t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    emb = list(zip(emb_t["vec_id"].to_pylist(), emb_t["embedding"].to_pylist()))

    mh = minhash_lsh_expected(docs)
    pq.write_table(pa.table(
        {"doc_a": [r[0] for r in mh], "doc_b": [r[1] for r in mh],
         "est_jaccard": [r[2] for r in mh]},
        schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("est_jaccard", pa.float64())]),
    ), os.path.join(outdir, "doc_minhash_lsh.parquet"))

    sh = simhash_expected(docs)
    pq.write_table(pa.table(
        {"doc_id": [r[0] for r in sh], "simhash": [r[1] for r in sh]},
        schema=pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())]),
    ), os.path.join(outdir, "doc_simhash.parquet"))

    la = lsh_ann_expected(emb)
    pq.write_table(pa.table(
        {"query_id": [r[0] for r in la], "neighbor_id": [r[1] for r in la],
         "cos_r": [r[2] for r in la]},
        schema=pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64()),
                          ("cos_r", pa.float64())]),
    ), os.path.join(outdir, "ann_lsh.parquet"))

    rz = tile_resize_expected(os.path.join(REPO, "data", "zonal_fixtures"))
    pq.write_table(pa.table(
        {"image_id": [r[0] for r in rz], "out_w": [r[1] for r in rz],
         "out_h": [r[2] for r in rz], "payload_md5": [r[3] for r in rz]},
        schema=pa.schema([("image_id", pa.string()), ("out_w", pa.int32()),
                          ("out_h", pa.int32()), ("payload_md5", pa.string())]),
    ), os.path.join(outdir, "tile_resize.parquet"))
    print(f"hash oracles written to {outdir}: minhash={len(mh)} simhash={len(sh)} "
          f"ann_lsh={len(la)} resize={len(rz)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
