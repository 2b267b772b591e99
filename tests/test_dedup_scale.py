"""Scale-safety of the dedup family (r2 verdict 'Next round' #3 and #5).

- ngram_jaccard_pairs: prefix-filtered candidate generation must be
  EXACT (lossless vs brute force) while avoiding the hot-shingle
  quadratic blowup (a shingle shared by 100+ docs must not generate
  O(k²) candidates when no pair qualifies).
- LSH band joins: max_bucket caps degenerate buckets (e.g. hundreds of
  identical docs) with documented drop semantics.
"""

import itertools
import random

import pytest

from python_rasterstats_spark.functions.dedup import (
    hamming_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_candidates,
    ngram_jaccard_pairs,
)


def _brute_jaccard_pairs(rows, n=3, threshold=0.4):
    """Pure-python oracle: exact shingle Jaccard over all within-block
    pairs."""
    def shingles(text):
        toks = text.strip().split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else None

    docs = [
        (doc_id, src, shingles(text))
        for doc_id, src, text in rows
        if shingles(text)
    ]
    out = {}
    for (ia, sa_, A), (ib, sb_, B) in itertools.combinations(docs, 2):
        if sa_ != sb_:
            continue
        a, b = (ia, ib) if ia < ib else (ib, ia)
        inter = len(A & B)
        j = inter / (len(A) + len(B) - inter)
        if j >= threshold:
            out[(a, b)] = round(j, 6)
    return out


def test_ngram_prefix_filter_is_exact(spark):
    """Randomized differential: prefix-filtered pairs == brute force,
    including pairs whose overlap lives in HOT shingles."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(3, 14))]
        rows.append((i, f"s{i % 2}", " ".join(toks)))
    # plant exact + near duplicates across blocks
    rows.append((100, "s0", rows[0][2]))
    rows.append((101, "s0", rows[0][2] + " w0"))
    rows.append((102, "s1", rows[1][2]))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_r"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    want = _brute_jaccard_pairs(rows)
    assert got == pytest.approx(want)
    assert (100, 102) not in got  # cross-block pair excluded by blocking
    assert got, "fixture must actually contain qualifying pairs"


def test_ngram_hot_shingle_no_candidate_blowup(spark):
    """120 docs share ONE hot shingle but no pair reaches the threshold:
    candidate generation must not go quadratic (the old shingle self-join
    emitted 120*119/2 = 7140 pairs here)."""
    rows = []
    for i in range(120):
        uniq = " ".join(f"u{i}x{j}" for j in range(8))
        rows.append((i, "s", f"{uniq} hot1 hot2 hot3"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    cands = ngram_jaccard_candidates(docs, threshold=0.4)
    assert cands.count() == 0  # hot shingle ranks last -> outside prefixes
    assert ngram_jaccard_pairs(docs, threshold=0.4).count() == 0


def test_ngram_prefix_keeps_hot_shingle_true_pairs(spark):
    """A genuinely duplicated doc whose shingles are ALL hot must still be
    found — exactness can't be bought by just df-capping shingles."""
    base = "hot1 hot2 hot3 hot4 hot5"
    rows = [(0, "s", base), (1, "s", base)]
    for i in range(2, 80):
        rows.append((i, "s", f"hot1 hot2 hot3 u{i}a u{i}b u{i}c u{i}d u{i}e"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_r"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    assert got == _brute_jaccard_pairs(rows) == {(0, 1): 1.0}


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """300 identical docs: every band bucket holds all 300. With
    max_bucket=50 the pathological buckets are dropped (documented recall
    trade: identical docs are exact-dedup's job) and the job completes
    with bounded output instead of 44,850 pairs."""
    rows = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_candidates(docs, max_bucket=50)
    assert capped.count() == 0
    # uncapped stays exact (all pairs estimated jaccard 1.0)
    some = minhash_lsh_candidates(docs.limit(20)).collect()
    assert len(some) == 190 and all(r["est_jaccard"] == 1.0 for r in some)

    sigs = spark.createDataFrame(
        [(i, 0x1234ABCD5678EF00) for i in range(200)], "vid long, sig long"
    )
    hp = hamming_pairs(sigs, id_col="vid", sig_col="sig", max_bucket=20)
    assert hp.count() == 0
    hp_small = hamming_pairs(
        sigs.limit(10), id_col="vid", sig_col="sig", max_bucket=20
    )
    assert hp_small.count() == 45  # under the cap: exact Hamming-ball set


def test_neardup_groups_matches_union_find(spark):
    """Min-label propagation == an independent union-find on random pair
    graphs (incl. chains, which need several propagation rounds)."""
    import random

    from python_rasterstats_spark.functions.dedup import neardup_groups

    rng = random.Random(9)
    edges = [(i, i + 1) for i in range(20, 29)]  # a 10-node chain
    edges += [(rng.randrange(100), rng.randrange(100)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    ).distinct()
    got = {
        r["doc_id"]: r["keeper_id"] for r in neardup_groups(pairs).collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want
    # the keeper really is each component's minimum
    comp: dict = {}
    for n, k in want.items():
        comp.setdefault(k, []).append(n)
    for k, members in comp.items():
        assert k == min(members)


def test_neardup_groups_chain_converges_logarithmically(spark):
    """r3 verdict 'Next round #8': a 1,000-node PATH component (diameter
    999) converges under the pointer-jump rounds — max_iters=15 only
    suffices if label chains compress geometrically (plain propagation
    would need ~999 rounds)."""
    from python_rasterstats_spark.functions.dedup import neardup_groups

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "doc_a long, doc_b long"
    )
    got = neardup_groups(pairs, max_iters=15).collect()
    assert len(got) == 1000
    assert all(r["keeper_id"] == 0 for r in got)
