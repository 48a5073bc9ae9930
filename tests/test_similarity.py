"""ANN search: brute-force exactness, LSH recall vs brute force,
IVF probe correctness."""

import numpy as np
import pytest

from starbelly_spark.operators.similarity import (
    cosine_topk,
    hyperplane_bucket_of,
    ivf_topk,
    lsh_topk,
    make_hyperplane_bucket_udf,
    train_centroids,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.PCG64(11))
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


@pytest.fixture(scope="module")
def query():
    rng = np.random.Generator(np.random.PCG64(12))
    return [float(x) for x in rng.standard_normal(16)]


def _brute(emb_rows, query, k):
    q = np.asarray(query)
    scored = []
    for vid, vec in emb_rows:
        v = np.asarray(vec)
        scored.append(
            (float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), vid)
        )
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_cosine_topk_matches_numpy(emb, query):
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    expect = _brute(rows, query, 10)
    got = [r.vec_id for r in cosine_topk(emb, query, k=10).collect()]
    assert got == expect


def test_bucket_udf_matches_driver_function(emb):
    bucket = make_hyperplane_bucket_udf(n_planes=8, seed=5)
    from pyspark.sql import functions as F

    out = emb.withColumn("b", bucket(F.col("embedding"))).collect()
    for r in out[:50]:
        assert r.b == hyperplane_bucket_of(r.embedding, 8, 5)


def test_lsh_topk_recall(spark, query):
    # plant a near-neighbor cluster around the query: the operator's
    # real workload (near-dup retrieval), where LSH recall is high
    rng = np.random.Generator(np.random.PCG64(13))
    q = np.asarray(query)
    rows = [
        (i, [float(x) for x in q + rng.standard_normal(16) * 0.05])
        for i in range(20)
    ] + [
        (100 + i, [float(x) for x in rng.standard_normal(16)])
        for i in range(180)
    ]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {r.vec_id for r in cosine_topk(emb2, query, k=10).collect()}
    approx = {r.vec_id for r in
              lsh_topk(emb2, query, k=10, n_planes=8, seed=5).collect()}
    assert len(exact & approx) >= 8


def test_ivf_topk(emb, query):
    cents = train_centroids(emb, n_centroids=8, sample_rows=200, seed=5)
    assert cents.shape[1] == 16
    got = [r.vec_id for r in
           ivf_topk(emb, query, cents, k=10, n_probe=4).collect()]
    exact = [r.vec_id for r in cosine_topk(emb, query, k=10).collect()]
    assert len(set(got) & set(exact)) >= 5
    # scores must be exact cosines (re-rank is exact inside probed cells)
    assert len(got) == 10
