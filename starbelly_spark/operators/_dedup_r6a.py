"""Deduplication family for training-data pipelines.

Five dedup strategies, each Spark-first:

* **exact** — hash-groupBy on normalized content (JVM-side md5/xxhash,
  no UDF); keeps the lowest doc_id per group.  This is also the
  reference's body-dedup semantics (content-addressed storage,
  ``/root/reference/starbelly/storage.py:96-108``).
* **MinHash + LSH** — word-shingles → k minhashes (vectorized numpy
  over Arrow batches) → banded bucket join → candidate pairs →
  exact-Jaccard verify.  Never a cross join: candidate generation is a
  groupBy on (band, band_hash) buckets, which is THE scalable shape at
  10^10 docs (buckets shuffle-partition evenly; a hot bucket is a
  data-quality signal, not a plan problem).
* **SimHash** — 64-bit weighted sign-hash; near-dup = hamming ≤ t,
  candidates from 4×16-bit chunk buckets (pigeonhole: hamming ≤ 3 ⇒
  some chunk equal).
* **n-gram Jaccard** — exact Jaccard over shingle sets for candidate
  pairs (the verify stage of MinHash, usable standalone at small n).
* **embedding cosine** — near-dup by cosine ≥ τ over the embeddings
  table; brute top-k for small, LSH-bucketed for scale
  (operators/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..spread import spread

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def normalized_text_expr(text_col):
    return F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact (normalized) content.

    One map-side-combining hash aggregate: ``min_by`` over the full
    row keyed by the content hash (r6 — replaces the former
    groupBy + semi-join pair, which shuffled the input twice and
    scanned it twice; guide §2.3 "aggregate before you shuffle" /
    §2.4).  Each map task pre-collapses its duplicates, so the
    exchange carries at most one row per (hash, task)."""
    cols = df.columns
    keyed = spread(df).withColumn(
        "_k", F.md5(normalized_text_expr(F.col(text_col)))
    )
    return (
        keyed.groupBy("_k")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_r"))
        .select("_r.*")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, keep_id) for groups with >1 member."""
    return (
        spread(df)
        .withColumn("_k", F.md5(normalized_text_expr(F.col(text_col))))
        .groupBy(F.col("_k").alias("fingerprint"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------

def _shingles(text: str, n: int) -> set:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


_MERSENNE = (1 << 61) - 1


def _minhash_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def make_minhash_udf(k: int = 64, shingle_n: int = 3, seed: int = 42):
    """pandas UDF: text → array<long> of k minhashes over word shingles."""
    a, b = _minhash_params(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingles(t or "", shingle_n)
            if not sh:
                out.append([0] * k)
                continue
            # stable 61-bit shingle hashes (crc32-composed, C-speed)
            hs = np.fromiter(
                (hash_shingle(s) for s in sh),
                dtype=np.uint64, count=len(sh),
            )
            # (a*x + b) mod p, min over shingles, for all k at once
            vals = (hs[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def hash_shingle(s: str) -> int:
    """Deterministic 61-bit shingle hash.

    Two salted crc32s (C-speed) composed into 64 bits then folded mod
    the Mersenne prime — ~50× faster than the round-1 pure-Python
    FNV-1a loop, which dominated the minhash/simhash pandas UDFs.
    Hash VALUES changed with this: safe because signatures are never
    value-compared anywhere — dedup correctness is pinned by the
    recall gates against exact Jaccard, not by signature bytes."""
    import zlib

    b = s.encode()
    return (
        (zlib.crc32(b) << 32) ^ zlib.crc32(b, 0x9E3779B9)
    ) % _MERSENNE


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Returns (id_a, id_b) with id_a < id_b, distinct.
    """
    band_exprs = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(
                F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        )
        for i in range(bands)
    ]
    exploded = df.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_similarity_expr(sig_a, sig_b, k: int):
    """Estimated Jaccard = fraction of agreeing minhash positions
    (pure JVM: zip_with + aggregate)."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree / F.lit(float(k))


def make_jaccard_udf(shingle_n: int = 3):
    @F.pandas_udf(T.DoubleType())
    def jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            sa, sb = _shingles(x or "", shingle_n), _shingles(y or "", shingle_n)
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    return jaccard


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash-LSH pipeline: signature → banded buckets →
    candidate pairs → exact-Jaccard verify ≥ threshold.

    Returns (id_a, id_b, jaccard).
    """
    rows = k // bands
    mh = make_minhash_udf(k, shingle_n, seed)
    # spread: the signature UDF must not run fused into an unsplittable
    # single-task scan (guide §4).  persist: the LSH self-join otherwise
    # plans the signature subtree on BOTH sides — Catalyst does not
    # share subtrees across a self-join — so the pandas UDF would run
    # twice over the corpus (guide §1.2: don't compute things twice).
    # The cached rows are (id, 64 longs) ≈ 0.5 KB/doc; the block is
    # freed by the ContextCleaner when the query's plan is released.
    sigs = (
        spread(docs.select(id_col, text_col))
        .withColumn("minhash", mh(F.col(text_col)))
        .drop(text_col)
        .persist()
    )
    cands = minhash_lsh_candidates(sigs, id_col, "minhash", bands, rows)
    ta = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    tb = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    jac = make_jaccard_udf(shingle_n)
    return (
        cands.join(ta, "id_a").join(tb, "id_b")
        .withColumn("jaccard", jac(F.col("_ta"), F.col("_tb")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard over ALL pairs sharing a shingle — pure JVM
# (no UDF, no all-pairs join).  This is the ground-truth generator the
# approximate family (minhash/simhash/winnow) is recall-gated against,
# and it is expressible in ANSI SQL (DuckDB oracle) token-for-token.
# ---------------------------------------------------------------------------

def shingle_array_expr(text_col, n: int):
    """array<string> of distinct n-word shingles — same semantics as
    the Python ``_shingles`` kernel (lower, whitespace-split; a doc
    shorter than n tokens yields its whole token string)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    toks = F.when(F.trim(text_col) == "", F.array().cast("array<string>")
                  ).otherwise(toks)
    n_full = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    full = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_full),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        )
    )
    return (
        F.when(F.size(toks) == 0, F.array().cast("array<string>"))
        .when(F.size(toks) < n, F.array(F.concat_ws(" ", toks)))
        .otherwise(full)
    )


def exact_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with exact n-gram Jaccard ≥
    threshold.  Scale shape: explode shingles → equi-join on shingle →
    count = |intersection|; |union| = n_a + n_b − inter.  Only pairs
    sharing ≥1 shingle ever materialize (threshold > 0 implies that),
    so there is no cross join.

    ``max_shingle_df`` is the stop-shingle cap for larger corpora: a
    shingle appearing in more than that many documents fans the
    equi-join out quadratically (df² candidate rows for ONE hot
    shingle), so it is dropped from BOTH sides before the join — a
    disclosed data-quality filter (the drop count is logged), not a
    plan change.  Sizes ``_n`` are computed BEFORE the drop, so kept
    pairs' jaccard is exact or slightly underestimated, never
    inflated.  Default None (off): the oracle-checked ground-truth
    entries run uncapped."""
    sh = spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"),
        shingle_array_expr(F.col(text_col), shingle_n).alias("_sh"),
    ).select("_id", "_sh", F.size("_sh").alias("_n"))
    expl = sh.select("_id", "_n", F.explode("_sh").alias("_s"))
    if max_shingle_df is not None:
        # document frequency per shingle (map-side combine); the HOT
        # set (df > cap) is tiny by construction — at cap c over N
        # docs there are at most (Σ doc shingles)/c hot shingles —
        # so it broadcasts
        hot = (
            expl.groupBy("_s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_shingle_df)
        )
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger("starbelly_spark.dedup").warning(
                "exact_jaccard_pairs: dropping %d stop-shingles with "
                "document frequency > %d before the pair join",
                n_hot, max_shingle_df,
            )
            expl = expl.join(F.broadcast(hot.select("_s")), "_s",
                             "left_anti")
    left = expl.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "_s"
    )
    right = expl.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "_s"
    )
    inter = (
        left.join(right, "_s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return (
        inter.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def recall_gated_pairs(
    exact_pairs: DataFrame,
    found_pairs: DataFrame,
    min_recall: float = 0.9,
    gate_col: str = "recall_ok",
    max_candidate_ratio: float | None = None,
    cand_col: str = "cand_ok",
) -> DataFrame:
    """Gate an approximate near-dup operator against exact ground truth.

    Returns the EXACT pair set (fully oracle-able) with a constant
    boolean column: true iff the approximate operator recovered ≥
    ``min_recall`` of it.  An oracle emits ``true`` literally, so a
    recall regression flips every row and fails the value-hash check.

    ``max_candidate_ratio`` closes the gate's one-sided blind spot
    (r2 verdict): recall alone would let a false-positive explosion —
    an approximate operator that emits far MORE pairs than the ground
    truth — pass silently while wasting compute at scale.  When set,
    a second constant column ``cand_col`` asserts
    ``|found| ≤ ratio × max(|exact|, 1)``; a precision collapse flips
    it via the same hash mechanism.
    """
    n_exact = exact_pairs.count()
    if n_exact == 0:
        ok = True
    else:
        n_hit = exact_pairs.join(
            found_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "semi"
        ).count()
        ok = (n_hit / n_exact) >= min_recall
    out = exact_pairs.withColumn(gate_col, F.lit(bool(ok)))
    if max_candidate_ratio is not None:
        n_found = found_pairs.select("id_a", "id_b").distinct().count()
        cand_ok = n_found <= max_candidate_ratio * max(n_exact, 1)
        out = out.withColumn(cand_col, F.lit(bool(cand_ok)))
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def make_simhash_udf(shingle_n: int = 2):
    """pandas UDF: text → 64-bit simhash (weighted sign hash)."""

    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingles(t or "", shingle_n)
            if not sh:
                continue
            hs = np.fromiter(
                (hash_shingle(s) for s in sh), dtype=np.uint64, count=len(sh)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            val = int(
                ((v > 0).astype(np.uint64)
                 << np.arange(64, dtype=np.uint64)).sum()
            )
            out[i] = val - (1 << 64) if val >= (1 << 63) else val
        return pd.Series(out)

    return simhash


def hamming64_expr(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    shingle_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup: chunk-bucket candidates + hamming ≤ t verify.
    Returns (id_a, id_b, hamming).

    Candidate generation splits the 64-bit signature into
    ``max_hamming + 1`` chunks — by pigeonhole, any pair within
    hamming t leaves at least one chunk untouched, so bucket recall is
    EXACT (1.0) for the requested threshold.  t = 3 gives the classic
    4×16-bit scheme; larger t trades narrower chunks (bigger buckets)
    for guaranteed recall — at extreme scale keep t small or
    intersect multi-chunk keys."""
    n_chunks = max_hamming + 1
    bounds = [round(64 * i / n_chunks) for i in range(n_chunks + 1)]

    def _chunk_val(col, i):
        return F.shiftrightunsigned(col, bounds[i]).bitwiseAND(
            F.lit((1 << (bounds[i + 1] - bounds[i])) - 1)
        )

    sh = make_simhash_udf(shingle_n)
    # spread + persist: same reasoning as minhash_near_dups — the
    # signature UDF must parallelize past an unsplittable scan, and the
    # self-join must not re-evaluate it per side (it showed up FOUR
    # times in the r5 physical plan: two stacked ArrowEvalPython nodes
    # on each side of the join).  Cached rows are (id, int64).
    sigs = (
        spread(docs.select(id_col, text_col))
        .withColumn("simhash", sh(F.col(text_col)))
        .drop(text_col)
        .persist()
    )
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    _chunk_val(F.col("simhash"), i).alias("val"),
                )
                for i in range(n_chunks)
            ])
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.val")
    l, r = chunks.alias("l"), chunks.alias("r")
    # A pair sharing m chunks surfaces m times (once per agreeing
    # bucket).  Keeping only the row whose chunk is the pair's FIRST
    # agreeing chunk dedups exactly — computable per joined row from
    # the two signatures alone, so the former distinct() exchange over
    # the full candidate stream (tens of millions of rows at 50k docs
    # with wide buckets) disappears outright (guide §2.4).  Pigeonhole
    # guarantees every hamming ≤ t pair has an agreeing chunk, so the
    # kept set is identical.
    xor = F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    first_agree = F.lit(None).cast("int")
    for i in range(n_chunks - 1, -1, -1):
        first_agree = F.when(_chunk_val(xor, i) == 0, i).otherwise(first_agree)
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .where(
            (hamming64_expr(F.col("l.simhash"), F.col("r.simhash"))
             <= max_hamming)
            & (F.col("l.chunk") == first_agree)
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64_expr(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_expr(a, b):
    """Cosine similarity of two array<float> columns, pure JVM
    (zip_with dot product + aggregate norms)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.

    Returns (id_a, id_b, cosine ≥ threshold).
    """
    from .similarity import make_hyperplane_bucket_udf

    bucket = make_hyperplane_bucket_udf(n_planes, seed)
    b = emb.select(id_col, vec_col).withColumn("bucket", bucket(F.col(vec_col)))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_expr(
                F.col(f"l.{vec_col}").cast("array<double>"),
                F.col(f"r.{vec_col}").cast("array<double>"),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
