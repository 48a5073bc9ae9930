"""Recall-gated correctness forms for the approximate dedup family.

The driver entries for minhash/simhash/winnow output the EXACT
ground-truth pair set (pure-JVM shingle join, DuckDB-oracled) plus a
constant recall gate.  These tests pin:

* exact_jaccard_pairs == brute-force Python Jaccard;
* simhash chunk-bucket candidates are pigeonhole-COMPLETE for the
  requested hamming threshold (n_chunks = t+1);
* the gate flips false on a recall regression.
"""

import itertools

from pyspark.sql import functions as F

from starbelly_spark.functions.text import winnow_fingerprints, winnow_pairs
from starbelly_spark.operators.dedup import (
    _shingles,
    exact_jaccard_pairs,
    recall_gated_pairs,
    simhash_near_dups,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4, "one two three four five six seven eight nine ten"),
    (5, "totally unrelated words here nothing shared at all today"),
    (6, "one two three four five six seven eight nine eleven"),
    (7, "xy"),
]


def _py_jaccard(a, b, n):
    sa, sb = _shingles(a, n), _shingles(b, n)
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 1.0


def _py_exact_pairs(n, thr):
    return sorted(
        (da, db)
        for (da, ta), (db, tb) in itertools.combinations(DOCS, 2)
        if _py_jaccard(ta, tb, n) >= thr
    )


def test_exact_jaccard_pairs_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for n, thr in ((3, 0.5), (2, 0.6)):
        got = sorted(
            (r.id_a, r.id_b)
            for r in exact_jaccard_pairs(df, threshold=thr, shingle_n=n).collect()
        )
        assert got == _py_exact_pairs(n, thr), (n, thr)


def test_exact_jaccard_values_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for r in exact_jaccard_pairs(df, threshold=0.3, shingle_n=3).collect():
        ta = dict(DOCS)[r.id_a]
        tb = dict(DOCS)[r.id_b]
        assert abs(r.jaccard - _py_jaccard(ta, tb, 3)) < 1e-12


def test_simhash_chunk_buckets_are_pigeonhole_complete(spark):
    """For t=6 (7 chunks) the candidate stage must surface EVERY pair
    with hamming ≤ 6 — compare against brute-force over signatures."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(df, max_hamming=6, shingle_n=2).collect()
    }
    from starbelly_spark.operators.dedup import make_simhash_udf

    sigs = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", make_simhash_udf(2)(F.col("text")).alias("sh")
        ).collect()
    }
    brute = {
        (a, b): bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
    }
    expect = {p: h for p, h in brute.items() if h <= 6}
    assert got == expect


def test_recall_gate_true_and_false(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    exact = exact_jaccard_pairs(df, threshold=0.5, shingle_n=3)
    ok = recall_gated_pairs(exact, exact, 0.9)
    assert ok.count() > 0
    assert all(r.recall_ok for r in ok.collect())
    empty = exact.where(F.lit(False))
    bad = recall_gated_pairs(exact, empty, 0.9)
    assert not any(r.recall_ok for r in bad.collect())


def test_recall_gate_empty_exact_is_ok(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    none = exact_jaccard_pairs(df, threshold=1.01, shingle_n=3)
    assert recall_gated_pairs(none, none, 0.9).count() == 0


def test_winnow_pairs_find_near_dups(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in winnow_pairs(df).collect()}
    assert (1, 2) in got and (1, 3) in got
    # sanity: the python kernel shares fingerprints exactly when pairs do
    fp1 = set(winnow_fingerprints(DOCS[0][1]))
    fp5 = set(winnow_fingerprints(DOCS[4][1]))
    assert not (fp1 & fp5)
    assert not any({a, b} == {1, 5} for a, b in got)
