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


def test_ivf_recall_on_clustered_fixture(spark):
    from pyspark.sql import functions as F

    """r3: IVF holds ≥0.9 recall at production-shaped n_probe=4/16 on
    CLUSTERED data (isotropic data can't — recall there ≈ probed
    fraction, the r2 caveat this fixture retires)."""
    import numpy as np

    from starbelly_spark.operators.similarity import (
        cluster_offsets,
        clustered_embedding_col,
        cosine_topk,
        ivf_topk,
        train_centroids,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    rows = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    offsets = cluster_offsets(16, 8, seed=9)
    clustered = emb.withColumn(
        "clustered",
        clustered_embedding_col(F.col("embedding"), F.col("vec_id"),
                                offsets, scale=3.0),
    )
    q = [float(x) for x in offsets[2]]
    exact_ids = [r.vec_id for r in
                 cosine_topk(clustered, q, k=10, vec_col="clustered")
                 .collect()]
    cents = train_centroids(clustered, n_centroids=8, vec_col="clustered")
    ivf_ids = {r.vec_id for r in
               ivf_topk(clustered, q, cents, k=10, n_probe=2,
                        vec_col="clustered").collect()}
    recall = sum(1 for i in exact_ids if i in ivf_ids) / len(exact_ids)
    assert recall >= 0.9
    # the exact top-k concentrates in the query's cluster (id % 8 == 2)
    # — the cluster structure is real, not incidental
    assert sum(1 for i in exact_ids if i % 8 == 2) >= 7
