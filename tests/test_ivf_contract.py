"""IVF query-side contract (r3 verdict 'Next round #5').

The driver-collect probe path is the right plan for few queries over a
huge corpus — but the contract was implicit. Now: the collect path RAISES
past max_queries, and distributed_queries=True assigns probes with JVM
expressions on the executors (no collect), joining candidates on list_id.
"""

import pytest
from pyspark.sql import functions as F

from python_rasterstats_spark.functions.similarity import (
    ivf_ann,
    ivf_assign,
    ivf_centroids,
    ivf_probe_lists,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_distributed_probe_path_matches_driver_path(emb):
    a = _rows(
        ivf_ann(emb, ncentroids=8, nprobe=3, query_max_id=6, threshold=0.2)
    )
    b = _rows(
        ivf_ann(
            emb, ncentroids=8, nprobe=3, query_max_id=6, threshold=0.2,
            distributed_queries=True,
        )
    )
    assert a == b and len(a) > 0


def test_probe_lists_rank_matches_numpy(emb):
    import numpy as np

    cents = ivf_centroids(emb, ncentroids=8)
    got = {}
    df = ivf_probe_lists(
        emb.filter(F.col("vec_id") < 6), cents, nprobe=3
    )
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["list_id"])
    for r in emb.filter(F.col("vec_id") < 6).collect():
        qv = np.asarray(r["embedding"], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        want = set(np.argsort(-(cents @ qv))[:3].tolist())
        assert got[r["vec_id"]] == want


def test_collect_path_raises_past_max_queries(emb):
    with pytest.raises(ValueError, match="max_queries"):
        ivf_ann(emb, query_max_id=50, max_queries=10).collect()
    # ...and the distributed path takes the same query set in stride
    assert (
        ivf_ann(
            emb, query_max_id=50, max_queries=10, distributed_queries=True,
            ncentroids=8, nprobe=8, threshold=0.5,
        ).count()
        >= 0
    )


def test_distributed_kmeans_matches_driver_kmeans(emb):
    """r5 (VERDICT r4 'Next round #7'): the executor-side assign +
    partial-sum k-means loop reproduces the driver-numpy loop when the
    driver's sample covers the corpus — same init, same spherical
    updates, only the summation order differs (float-assoc ~1e-15)."""
    import numpy as np

    from python_rasterstats_spark.functions.similarity import (
        ivf_centroids_distributed,
    )

    n = emb.count()
    kw = dict(ncentroids=8, iters=5, sample=n + 10, seed=7)
    driver = ivf_centroids(emb, **kw)
    dist = ivf_centroids_distributed(emb, **kw)
    assert driver.shape == dist.shape
    assert np.allclose(driver, dist, atol=1e-9), (
        np.abs(driver - dist).max()
    )
    # and the trained quantizer slots straight into the assignment path
    a = _rows(ivf_assign(emb, dist).select("vec_id", "list_id"))
    b = _rows(ivf_assign(emb, driver).select("vec_id", "list_id"))
    assert a == b
