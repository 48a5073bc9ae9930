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


def test_candidate_gate_flips_on_explosion(spark):
    """r3: the precision side of the gate — found ≫ exact flips
    cand_ok while recall_ok stays true (superset recall is 1.0)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    exact = exact_jaccard_pairs(df, threshold=0.9, shingle_n=3)
    ids = df.select(F.col("doc_id").alias("id_a"))
    explosion = (
        ids.crossJoin(df.select(F.col("doc_id").alias("id_b")))
        .where(F.col("id_a") < F.col("id_b"))
    )
    out = recall_gated_pairs(exact, explosion, 0.9,
                             max_candidate_ratio=8.0).collect()
    assert out and all(r.recall_ok for r in out)
    assert not any(r.cand_ok for r in out)
    ok = recall_gated_pairs(exact, exact, 0.9,
                            max_candidate_ratio=8.0).collect()
    assert all(r.cand_ok and r.recall_ok for r in ok)


def test_winnow_overlap_verify_rejects_common_phrase(spark):
    """The MOSS overlap verify: one shared phrase in otherwise
    unrelated docs is NOT a near-dup pair (pre-r3 it was — measured
    124,739 candidates for 25 true pairs on sf0.01)."""
    docs = [
        (1, "the quarterly report shows strong growth in all regions "
            "and the board approved the new budget for next year"),
        (2, "the quarterly report shows strong growth in all regions "
            "and the board approved the new budget for next season"),
        (3, "completely different content about gardening tips here "
            "but it mentions the quarterly report shows strong growth "
            "in passing among many other unrelated topics and words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in winnow_pairs(df).collect()}
    assert (1, 2) in got          # near-identical → found
    assert (1, 3) not in got      # shared phrase only → rejected
    assert (2, 3) not in got


def test_stop_shingle_cap_bounds_degenerate_join(spark):
    """r3: exact_jaccard_pairs with max_shingle_df drops hot shingles
    (every doc shares one phrase) instead of a quadratic join blow-up;
    true near-dup pairs survive via their non-hot shingles."""
    common = "lorem ipsum dolor sit amet"
    docs = [(i, f"{common} unique{i} text{i} body{i} words{i}")
            for i in range(1, 40)]
    docs += [(100, f"{common} twin alpha beta gamma"),
             (101, f"{common} twin alpha beta gamma")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # sizes count pre-drop shingles, so kept pairs' jaccard is
    # underestimated (twins: 4 surviving shared / 7+7-4 = 0.4)
    capped = exact_jaccard_pairs(df, threshold=0.35, shingle_n=3,
                                 max_shingle_df=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    # the hot common-prefix shingles may no longer create pairs among
    # the 39 otherwise-unrelated docs
    assert not any(a < 100 and b < 100 for a, b in got)
