"""Text-analysis functions: language-ID heuristic, token counts,
quality score bounds, fingerprints, winnowing."""

from pyspark.sql import functions as F

from starbelly_spark.functions.text import (
    bpe_ish_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
    winnow_fingerprints,
    winnow_udf,
)

SAMPLES = [
    (1, "the cat sat on the mat and it was happy for the rest of the day"),
    (2, "der hund ist nicht auf der couch und das ist gut mit der zeit"),
    (3, "le chat est dans la maison et les oiseaux sont pour la vie"),
    (4, "el perro es una mascota que vive con los humanos por la casa"),
    (5, "zzz qqq xxx"),
]


def _df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


def test_lang_id(spark):
    got = {
        r.doc_id: r.lang
        for r in _df(spark)
        .select("doc_id", lang_id_expr(F.col("text")).alias("lang"))
        .collect()
    }
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "es" and got[5] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, "   "), (4, "hello, world! 42")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n, r.b)
        for r in df.select(
            "doc_id",
            token_count_expr(F.col("text")).alias("n"),
            bpe_ish_token_count_expr(F.col("text")).alias("b"),
        ).collect()
    }
    assert got[1] == (3, 3)
    assert got[2][0] == 0 and got[3][0] == 0
    # "hello" "," "world" "!" "4" "2" → 6 BPE-ish pieces
    assert got[4] == (3, 6)


def test_quality_score_bounds(spark):
    out = _df(spark).select(
        quality_score_expr(F.col("text")).alias("q")
    ).collect()
    assert all(0.0 <= r.q <= 1.0 for r in out)
    # real sentences score higher than junk
    scores = [r.q for r in out]
    assert scores[0] > scores[4]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    got = [r.fp for r in df.select(
        fingerprint_expr(F.col("text")).alias("fp")).collect()]
    assert got[0] == got[1] != got[2]


def test_winnowing():
    a = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    b = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    assert a == b and len(a) > 3
    c = winnow_fingerprints("a completely different sentence here")
    assert len(set(a) & set(c)) < max(len(a), len(c)) // 2
    assert winnow_fingerprints("ab") == []


def test_winnow_udf(spark):
    out = _df(spark).select(
        "doc_id", F.size(winnow_udf(F.col("text"))).alias("n")
    ).collect()
    assert all(r.n > 0 for r in out)


def test_lang_id_ngram_kernel():
    from starbelly_spark.functions.text import lang_id_ngram

    assert lang_id_ngram("the cat and the dog that it was for") == "en"
    assert lang_id_ngram("der hund und die katze ist nicht mit") == "de"
    assert lang_id_ngram("") == "und"
    assert lang_id_ngram("zzzz qqqq") == "und"


def test_lang_id_ngram_udf(spark):
    from starbelly_spark.functions.text import lang_id_ngram_udf

    df = _df(spark)
    got = {r.doc_id: r.l for r in df.select(
        "doc_id", lang_id_ngram_udf(F.col("text")).alias("l")).collect()}
    assert got[1] == "en" and got[5] == "und"
