"""Regression tests for the round-3 ADVICE findings.

1. (low) dedup prefix length: F.ceil(t * n) in float64 — products like
   0.07*100 evaluate to 7.000000000000001, so ceil returned 8 and the
   prefix fell one below the lossless bound; an exact-boundary pair
   (jaccard == threshold) was then missed. Fixed with an epsilon guard.
2. (low) jpeg_decode marker loop: legal baseline streams may pad with
   0xFF fill bytes before a marker and carry length-less standalone
   markers (TEM 0x01, stray RSTn) between segments; the parser now
   tolerates both.
3. (low) _frame_index cast row*ncols to int32, overflowing past ~2.1B
   frames; now int64 end-to-end.
"""

import numpy as np
from pyspark.sql import functions as F, types as T

from python_rasterstats_spark import jpegcodec as J
from python_rasterstats_spark.functions.dedup import ngram_jaccard_pairs
from python_rasterstats_spark.functions.multimodal import _frame_index


def test_exact_boundary_jaccard_pair_survives_prefix_rounding(spark):
    # A: 102 distinct tokens -> 100 distinct 3-shingles. B: a 9-token
    # contiguous span of A -> 7 shingles, all subset of A's.
    # jaccard(A, B) = 7 / 100 = 0.07 == threshold exactly, and
    # 0.07 * 100 = 7.000000000000001 in float64: without the epsilon
    # guard A's prefix is 93, the 7 shared shingles (df=2, ranked last)
    # occupy ranks 94-100, and the boundary pair is silently missed.
    toks_a = [f"t{i:03d}" for i in range(102)]
    text_a = " ".join(toks_a)
    text_b = " ".join(toks_a[40:49])  # 9 tokens -> 7 shingles
    docs = spark.createDataFrame(
        [(1, text_a, "s"), (2, text_b, "s")],
        "doc_id long, text string, source string",
    )
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.07).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert abs(pairs[0]["jaccard_r"] - 0.07) < 1e-9


def test_jpeg_decode_tolerates_fill_bytes_and_tem_markers():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    data = J.jpeg_encode(img)
    want = J.jpeg_decode(data)
    # splice a TEM marker and 0xFF fill padding right after SOI — both
    # legal in baseline streams (T.81 B.1.1.2) and previously fatal
    spliced = data[:2] + b"\xff\x01" + b"\xff" + data[2:]
    got = J.jpeg_decode(spliced)
    assert np.array_equal(got, want)


def test_frame_index_is_int64_and_survives_billion_frame_grids(spark):
    tiles = spark.createDataFrame(
        [("v", 2_000_000, 1_999, "f0"), ("v", 0, 0, "f1")],
        "dataset string, tile_row int, tile_col int, image_id string",
    )
    out = _frame_index(tiles)
    assert isinstance(out.schema["frame_idx"].dataType, T.LongType)
    got = {r["image_id"]: r["frame_idx"] for r in out.collect()}
    assert got["f0"] == 2_000_000 * 2_000 + 1_999  # > 2^31
    assert got["f1"] == 0
