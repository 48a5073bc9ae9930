"""Similarity search over embedding columns (task brief: ANN).

* ``cosine_topk`` — brute-force exact top-k by cosine: JVM-side
  zip_with dot product, window-free global top-k via orderBy+limit.
  The correctness baseline, and the right plan when the query set is
  small (Catalyst broadcasts the literal query vector).
* ``hyperplane buckets`` — random-hyperplane LSH (sign sketch): the
  scale path.  Bucketing is a deterministic pandas UDF (numpy matmul
  over Arrow batches); probing scans only the query's bucket (and
  optionally multi-probe neighbors at 1 bit flip).
* ``ivf_topk`` — IVF-style: k-means-lite centroids (deterministic
  seeded sample, Lloyd iterations in numpy on the driver over a
  SAMPLE, never the full table), assign via UDF, probe nearest
  ``n_probe`` centroid cells.

At 100 TB the bucketed/IVF variants turn an all-pairs scan into a
partition-pruned scan of a few cells; the bucket id is a natural
partition column for the embeddings table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import cosine_expr


def query_vec_lit(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cosine) descending."""
    q = query_vec_lit(query)
    return (
        emb.select(
            F.col(id_col),
            cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane matrix.  Values are float32-quantized
    (exactly representable in float64) and ALL dot products are
    computed in float64 — so an external engine given the same plane
    literals (see ``hyperplanes_as_lists``) reproduces the sign
    buckets bit-for-bit, making the LSH family oracle-able in SQL."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, n_planes)).astype(np.float32).astype(
        np.float64
    )


def hyperplanes_as_lists(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """The exact plane vectors as Python floats (one list per plane) —
    emit these as SQL literals to replicate bucketing in an oracle."""
    p = _planes(dim, n_planes, seed)
    return [[float(x) for x in p[:, j]] for j in range(n_planes)]


def make_hyperplane_bucket_udf(n_planes: int = 12, seed: int = 42):
    """pandas UDF: embedding → int bucket id (sign sketch).

    Planes are derived lazily from the first batch's dimensionality —
    deterministic given (dim, n_planes, seed).
    """

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        planes = _planes(mat.shape[1], n_planes, seed)
        signs = (mat @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def hyperplane_bucket_of(vec, n_planes: int = 12, seed: int = 42) -> int:
    v = np.asarray(vec, dtype=np.float64)
    planes = _planes(len(v), n_planes, seed)
    signs = (v @ planes) > 0
    return int((signs * (1 << np.arange(n_planes))).sum())


def lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket (+ 1-bit-flip
    neighbors for recall).  Same output shape as cosine_topk."""
    qb = hyperplane_bucket_of(query, n_planes, seed)
    probe = {qb}
    if multiprobe_bits >= 1:
        probe |= {qb ^ (1 << i) for i in range(n_planes)}
    # asNondeterministic: the probe filter references the UDF's output
    # column, so the optimizer otherwise pushes the filter below the
    # projection and evaluates the bucket UDF twice over the full table
    # (guide §4.4).  The function is pure; the marking only stops the
    # optimizer duplicating it.
    bucket = make_hyperplane_bucket_udf(n_planes, seed).asNondeterministic()
    bucketed = emb.withColumn("bucket", bucket(F.col(vec_col)))
    cand = bucketed.where(F.col("bucket").isin(*sorted(probe)))
    return cosine_topk(cand, query, k, id_col, vec_col)


def cluster_offsets(dim: int, n_clusters: int, seed: int) -> np.ndarray:
    """Deterministic unit cluster-center offsets (float32-quantized so
    an external engine given the literals reproduces the arithmetic
    bit-for-bit, like ``_planes``).  Used to derive a CLUSTERED
    embedding fixture from an isotropic one: ``v + scale·offset[id %
    n]`` — real corpora cluster, isotropic gaussians don't, and IVF
    recall at small n_probe is only meaningful on clustered data."""
    rng = np.random.Generator(np.random.PCG64(seed))
    m = rng.standard_normal((n_clusters, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m.astype(np.float32).astype(np.float64)


def cluster_offsets_as_lists(dim: int, n_clusters: int,
                             seed: int) -> list[list[float]]:
    return [[float(x) for x in row]
            for row in cluster_offsets(dim, n_clusters, seed)]


def clustered_embedding_col(vec_col, id_col, offsets: np.ndarray,
                            scale: float = 3.0):
    """JVM-side column: embedding + scale·offset[vec_id % n_clusters]
    (zip_with over literal arrays — float64 exact, oracle-able)."""
    cent_arrays = F.array(*[
        F.array(*[F.lit(float(x)) for x in row]) for row in offsets
    ])
    # F.get (not element_at): Spark 4 ANSI element_at throws on OOB
    cent = F.get(cent_arrays,
                 (id_col % F.lit(len(offsets))).cast("int"))
    return F.zip_with(
        vec_col.cast("array<double>"), cent,
        lambda a, b: a + F.lit(float(scale)) * b,
    )


# ---------------------------------------------------------------------------
# IVF-style index
# ---------------------------------------------------------------------------

def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd iterations on a bounded deterministic sample (driver-side
    numpy on ≤ sample_rows vectors — never the full table)."""
    sample = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<float>").cast("string")))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r[0] for r in sample], dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) + 1e-9)
    return cents


def make_ivf_assign_udf(centroids: np.ndarray):
    cents = centroids.astype(np.float32)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.asarray(vecs.tolist(), dtype=np.float32)
        mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-9)
        return pd.Series((mat @ cents.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest centroid cells, exact re-rank inside."""
    q = np.asarray(query, dtype=np.float32)
    q = q / (np.linalg.norm(q) + 1e-9)
    order = np.argsort(-(centroids @ q))[:n_probe]
    # asNondeterministic: same §4.4 duplication as lsh_topk — the cell
    # filter otherwise re-evaluates the assign UDF below itself
    assign = make_ivf_assign_udf(centroids).asNondeterministic()
    cand = emb.withColumn("cell", assign(F.col(vec_col))).where(
        F.col("cell").isin(*[int(c) for c in order])
    )
    return cosine_topk(cand, query, k, id_col, vec_col)
