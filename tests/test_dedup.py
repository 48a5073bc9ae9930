"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — planted duplicates must be found, distinct docs not."""

import pytest
from pyspark.sql import functions as F

from starbelly_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    exact_dup_groups,
    hash_shingle,
    make_jaccard_udf,
    make_minhash_udf,
    make_simhash_udf,
    minhash_near_dups,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                                  # exact dup of 1
        (3, BASE.replace("lazy", "sleepy")),        # near dup of 1
        (4, "completely different text about spark sql window functions "
            "and shuffle partitions in distributed query engines"),
        (5, "  " + BASE.upper() + "  "),            # exact after normalize
        (6, "short unrelated"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [1, 3, 4, 6]   # 2 and 5 are exact dups of 1


def test_exact_dup_groups(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 3 and groups[0].keep_id == 1


def test_simhash_candidate_dedup_is_exact(docs):
    """r6 internals change: the first-agreeing-chunk filter replaced
    the distinct() exchange.  Identical texts (1,2,5-normalized) agree
    in EVERY chunk — each qualifying pair must still appear exactly
    once, and the full output must equal a brute-force hamming check
    over the signatures."""
    out = simhash_near_dups(docs, max_hamming=6, shingle_n=2).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate candidate rows"
    sh = make_simhash_udf(2)
    sigs = {
        r.doc_id: r.s
        for r in docs.select("doc_id", sh("text").alias("s")).collect()
    }
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & mask).count("1")

    expect = {
        (a, b, ham(a, b))
        for a in sigs for b in sigs
        if a < b and ham(a, b) <= 6
    }
    assert {(r.id_a, r.id_b, r.hamming) for r in out} == expect


def test_minhash_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in
             minhash_near_dups(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p or 6 in p for p in pairs)


def test_minhash_signature_properties(spark):
    mh = make_minhash_udf(k=32)
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, "something else entirely unrelated")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.sig for r in
            df.select("doc_id", mh("text").alias("sig")).collect()}
    assert rows[1] == rows[2]          # identical text → identical sig
    agree = sum(a == b for a, b in zip(rows[1], rows[3])) / 32
    assert agree < 0.3                  # unrelated text → low agreement


def test_simhash_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in
             simhash_near_dups(docs, max_hamming=8).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs
    assert not any((a == 4 or b == 4) for a, b in pairs)


def test_ngram_jaccard_udf(spark):
    jac = make_jaccard_udf(shingle_n=2)
    df = spark.createDataFrame([(BASE, BASE), (BASE, "zzz yyy xxx www")],
                               "a string, b string")
    vals = [r.j for r in df.select(jac("a", "b").alias("j")).collect()]
    assert vals[0] == 1.0 and vals[1] < 0.05


def test_hash_shingle_deterministic():
    assert hash_shingle("a b c") == hash_shingle("a b c")
    assert hash_shingle("a b c") != hash_shingle("a b d")


def test_embedding_near_dups(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal(16).astype("float32")
    near = base + rng.standard_normal(16).astype("float32") * 0.01
    far = rng.standard_normal(16).astype("float32")
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in near]),
        (3, [float(x) for x in far]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b): r.cosine
             for r in embedding_near_dups(emb, threshold=0.95,
                                          n_planes=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs
