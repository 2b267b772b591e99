"""Tests for the training-pipeline function modules (dedup, similarity,
text, multimodal) — statistical properties of the sketch-based ops that
have no SQL oracle, plus plumbing checks."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_estimates_jaccard(spark, docs):
    """MinHash LSH candidates must include the true near-dup pairs and the
    estimate must track exact Jaccard."""
    from python_rasterstats_spark.functions.dedup import (
        minhash_lsh_candidates, ngram_jaccard_pairs,
    )

    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard_r"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(docs).collect()
    }
    for pair, true_j in truth.items():
        assert pair in cands, f"missed true near-dup {pair} (jaccard {true_j})"
        assert cands[pair] == pytest.approx(true_j, abs=0.25)


def test_simhash_separates_dups(spark, docs):
    """Near-duplicate docs have closer simhashes than random pairs."""
    from python_rasterstats_spark.functions.dedup import (
        ngram_jaccard_pairs, simhash,
    )

    dup_pairs = [
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    ]
    if not dup_pairs:
        pytest.skip("no near-dup pair at this sf")
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    dup_d = min(hamming(sh[a], sh[b]) for a, b in dup_pairs)
    ids = sorted(sh)[:20]
    rand_d = sum(
        hamming(sh[a], sh[b]) for a, b in zip(ids[:10], ids[10:20])
    ) / 10
    assert dup_d < rand_d, (dup_d, rand_d)


def test_lsh_ann_subset_of_bruteforce(spark, emb):
    """LSH-ANN results are a subset of brute-force results (same threshold)
    and recall is non-trivial."""
    from python_rasterstats_spark.functions.similarity import (
        cosine_neighbors, lsh_ann,
    )

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_neighbors(emb, query_max_id=10, threshold=0.2).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann(emb, nplanes=4, query_max_id=10, threshold=0.2).collect()
    }
    assert approx <= brute
    if brute:
        assert len(approx) / len(brute) > 0.05  # 4 planes → coarse but useful


def test_cosine_topk_ordering(spark, emb):
    from python_rasterstats_spark.functions.similarity import cosine_topk

    out = cosine_topk(emb, query_max_id=3, k=4).toPandas()
    for _, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        sims = list(grp["cos_r"])
        assert sims == sorted(sims, reverse=True)


def test_resize_and_frame_sample(corpus):
    from python_rasterstats_spark.functions.multimodal import (
        frame_sample, resize_tiles,
    )
    from python_rasterstats_spark import codecs as C
    import numpy as np

    tiles, _, _ = corpus
    one = tiles.filter(F.col("dataset") == "slope")
    rs = resize_tiles(one, out=8).collect()
    assert len(rs) == one.count()
    for r in rs:
        arr = C.decode_tile(bytes(r["bytes"]), "npy")
        assert arr.shape == (8, 8)
        assert np.isfinite(arr).all()
    fs = frame_sample(one, every=4)
    n_tiles = one.count()
    assert fs.count() == -(-n_tiles // 4)  # ceil
    assert fs.filter(F.col("frame_idx") % 4 != 0).count() == 0


def test_exact_dups_finds_planted(spark, docs):
    """Planted duplicate rows are grouped by content hash."""
    from python_rasterstats_spark.functions.dedup import exact_dups

    two = docs.limit(1)
    planted = docs.unionByName(
        two.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    out = exact_dups(planted)
    dups = out.filter(F.col("dup_count") > 1).collect()
    assert len(dups) == 2
    assert {r["keeper_id"] for r in dups} == {two.collect()[0]["doc_id"]}


def test_embedding_neardup_lsh_recall_and_precision(spark, emb):
    """The gated LSH near-dup path returns EXACTLY the brute-force pair set
    on the fixture corpus (recall 1.0 at bands=32 × rplanes=3; precision
    1.0 from the exact cosine rescore)."""
    from python_rasterstats_spark.functions.dedup import (
        embedding_neardup, embedding_neardup_lsh,
    )

    bf = {(r["vec_a"], r["vec_b"], r["cos_r"]) for r in
          embedding_neardup(emb, threshold=0.35, query_max_id=50).collect()}
    ls = {(r["vec_a"], r["vec_b"], r["cos_r"]) for r in
          embedding_neardup_lsh(emb, threshold=0.35, query_max_id=50).collect()}
    assert bf and ls == bf


def test_simhash_pairs_pigeonhole_exact(spark, docs):
    """radius < bands ⇒ band-bucket candidates cover the whole Hamming
    ball: simhash_pairs equals brute-force all-pairs Hamming filtering."""
    from pyspark.sql import functions as F

    from python_rasterstats_spark.functions.dedup import simhash, simhash_pairs

    docs = docs.limit(200)
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
           simhash_pairs(docs, bands=8, radius=3).collect()}
    sh = simhash(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    want = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
            a.join(b, F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
             .filter(F.col("hamming") <= 3).collect()}
    assert got == want


def test_pcm16_roundtrip_and_audio_features(spark):
    """Audio leg plumbing: pcm16 codec roundtrips bit-exactly; windowed
    features through Spark match a direct numpy computation."""
    import numpy as np

    from python_rasterstats_spark import codecs as C
    from python_rasterstats_spark.functions.multimodal import (
        audio_window_features,
    )

    rng = np.random.default_rng(4)
    s16 = (rng.integers(-32768, 32768, size=5000)).astype(np.int16)
    payload = C.pcm16_encode(s16, 8000)
    back, sr = C.pcm16_decode(payload)
    assert sr == 8000 and np.array_equal(back, s16)

    df = spark.createDataFrame(
        [("c0", bytearray(payload))], "clip_id string, bytes binary"
    )
    rows = {r["win_idx"]: r.asDict()
            for r in audio_window_features(df, win=1024).collect()}
    assert len(rows) == 4  # 5000 // 1024, trailing partial dropped
    w0 = s16[:1024].astype(np.float64) / 32768.0
    assert rows[0]["rms_r"] == round(float(np.sqrt((w0 * w0).mean())), 6)
    assert rows[0]["peak"] == int(np.abs(s16[:1024].astype(np.int64)).max())


def test_hamming_pairs_generic_pigeonhole(spark):
    """hamming_pairs on random 64-bit signatures equals brute force for
    radius < bands (the helper behind simhash_pairs and phash_neardup)."""
    import numpy as np

    from python_rasterstats_spark.functions.dedup import hamming_pairs

    rng = np.random.default_rng(9)
    base = rng.integers(-2**63, 2**63, size=60, dtype=np.int64)
    # plant near-dups: flip ≤5 bits of some signatures
    sigs = list(base)
    for i in range(0, 20, 4):
        v = int(base[i])
        for b in rng.integers(0, 64, size=int(rng.integers(0, 6))):
            v ^= 1 << int(b)
        sigs.append(v)
    df = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sigs)], "rid long, sig long"
    )
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in hamming_pairs(
        df, id_col="rid", sig_col="sig", bands=8, radius=7).collect()}
    arr = np.array(sigs, dtype=np.int64).astype(np.uint64)
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = int(bin(int(arr[i] ^ arr[j])).count("1"))
            if h <= 7:
                want.add((i, j, h))
    assert got == want and want


def test_ivf_ann_exhaustive_equals_bruteforce_and_partial_probe_recall(spark, emb):
    """IVF with nprobe == ncentroids is exhaustive by construction — the
    EXACT brute-force set (this is what the ann_ivf gate relies on);
    probing fewer lists yields a subset with useful recall."""
    from python_rasterstats_spark.functions.similarity import (
        cosine_neighbors, ivf_ann,
    )

    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos_r"]
        for r in cosine_neighbors(emb, query_max_id=8, threshold=0.2).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"]): r["cos_r"]
        for r in ivf_ann(
            emb, ncentroids=8, nprobe=8, query_max_id=8, threshold=0.2
        ).collect()
    }
    assert full == brute
    part = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann(
            emb, ncentroids=8, nprobe=2, query_max_id=8, threshold=0.2
        ).collect()
    }
    assert part <= set(brute)
    if brute:
        assert len(part) / len(brute) > 0.2  # 2/8 lists probed


def test_ivf_assignment_is_nearest_centroid(spark, emb):
    import numpy as np

    from python_rasterstats_spark.functions.similarity import (
        ivf_assign, ivf_centroids,
    )

    cents = ivf_centroids(emb, ncentroids=6)
    rows = ivf_assign(emb.limit(64), cents).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        sims = cents @ v
        assert int(r["list_id"]) == int(np.argmax(sims))


def test_bilinear_resize_exact_on_linear_ramp(spark, corpus):
    """Bilinear interpolation reproduces a LINEAR field exactly at every
    interior sample point — the analytic correctness check that needs no
    imaging-library reference."""
    import numpy as np

    from python_rasterstats_spark.functions.multimodal import (
        _bilinear_resize, resize_tiles,
    )
    from python_rasterstats_spark import codecs as C

    y, x = np.mgrid[0:32, 0:32]
    ramp = (3.0 * x - 2.0 * y + 7.0).astype(np.float64)
    small = _bilinear_resize(ramp, 8)
    ys = (np.arange(8) + 0.5) * 32 / 8 - 0.5
    xs = (np.arange(8) + 0.5) * 32 / 8 - 0.5
    want = 3.0 * xs[None, :] - 2.0 * ys[:, None] + 7.0
    assert np.allclose(small, want, atol=1e-9)

    # distributed path produces decodable payloads of the right shape
    tiles, _, _ = corpus
    out = resize_tiles(tiles.limit(4), out=8, method="bilinear").collect()
    for r in out:
        blk = C.decode_tile(bytes(r["bytes"]), "npy")
        assert blk.shape == (8, 8) and np.isfinite(blk).all()


def test_sequence_pack_semantics(spark):
    """r5 packing op: bins fill to the token budget within each bucket in
    doc_id order; assignments are a pure function of the data (invariant
    to partitioning), and every doc is packed exactly once."""
    from python_rasterstats_spark.functions.textops import sequence_pack

    rows = [(i, " ".join(["w"] * (10 + (i * 7) % 23))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sequence_pack(docs, budget=64, buckets=4)
    got = {(r["bucket"], r["bin_id"]): r for r in out.collect()}
    # replicate the rule in plain python
    want = {}
    for b in range(4):
        cum = 0
        for i in sorted(i for i, _ in rows if i % 4 == b):
            tok = 10 + (i * 7) % 23
            key = (b, cum // 64)
            want.setdefault(key, []).append((i, tok))
            cum += tok
    assert set(got) == set(want)
    for key, members in want.items():
        r = got[key]
        assert r["n_docs"] == len(members)
        assert r["tok_sum"] == sum(t for _, t in members)
        assert r["first_doc"] == min(i for i, _ in members)
        assert r["last_doc"] == max(i for i, _ in members)
    assert sum(r["n_docs"] for r in got.values()) == 60
    # repartitioning the input does not change any assignment
    out2 = sequence_pack(docs.repartition(7), budget=64, buckets=4)
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, out.collect()))


def test_tfidf_top_terms(spark):
    """Rare-but-frequent-in-doc terms beat common terms; ties break to the
    lexicographically smaller term."""
    from python_rasterstats_spark.functions.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common rare rare rare"),
            (2, "common common common zebra"),
            (3, "common apple banana"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in tfidf_top_terms(docs).collect()}
    assert got[1]["top_term"] == "rare"          # df=1, tf=3
    # tf=3 of the everywhere-term (idf floor 1.0 -> score 3.0) still beats
    # one rare 'zebra' (1*(ln(2)+1) ~ 1.69)
    assert got[2]["top_term"] == "common" and got[2]["score_r"] == 3.0
    assert got[3]["top_term"] == "apple"         # apple/banana tie -> lex min
    assert got[1]["tf"] == 3 and got[1]["df"] == 1


def test_contamination_check(spark):
    """A test doc sharing a 5-gram with ANY train doc is flagged; disjoint
    docs are not; short docs (< n tokens) don't emit rows."""
    from python_rasterstats_spark.functions.textops import contamination_check

    train_txt = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, train_txt),                               # train
            (2, "completely different training content here"),  # train
            (1, "prefix words then the quick brown fox jumps again"),  # test: hit
            (3, "no overlap with anything in the training side at all"),  # test
            (5, "too short"),                             # test, < 5 tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contamination_check(docs, n=5).collect()}
    assert set(got) == {1, 3}
    assert got[1]["contaminated"] and got[1]["n_overlap"] >= 1
    assert not got[3]["contaminated"] and got[3]["n_overlap"] == 0
    assert got[3]["contam_ratio_r"] == 0.0
    assert 0 < got[1]["contam_ratio_r"] <= 1.0


def test_pii_scrub(spark):
    """Emails/phones/IPs/SSNs are redacted with typed sentinels and
    counted; clean docs pass through unchanged (md5-stable)."""
    import hashlib

    from python_rasterstats_spark.functions.textops import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or +1-555-867-5309 today"),
            (2, "server at 10.0.42.17 holds ssn 123-45-6789"),
            (3, "perfectly clean prose with no identifiers"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["had_pii"] and got[2]["had_pii"]
    assert got[2]["n_ipv4"] == 1 and got[2]["n_ssn"] == 1
    assert not got[3]["had_pii"]
    clean_md5 = hashlib.md5(
        b"perfectly clean prose with no identifiers").hexdigest()
    assert got[3]["scrubbed_md5"] == clean_md5
    # the scrubbed text really lost the address (md5 of expected redaction)
    want1 = hashlib.md5(
        b"contact <EMAIL> or <PHONE> today").hexdigest()
    assert got[1]["scrubbed_md5"] == want1
