"""BM25 + decontamination (operators/retrieval.py) semantics."""

import math

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.operators.retrieval import bm25_scores, decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_decontaminate_flags_overlap_and_counts(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),  # shares 'quick brown fox'
            (2, "totally unrelated words here now"),
            (3, "hi there"),  # < 3 tokens: no shingles
        ],
    )
    probe = _docs(spark, [(100, "a Quick Brown Fox story")])
    got = {
        r["id"]: (r["n_shared"], r["n_shingles"])
        for r in decontaminate(corpus, probe, "id", "text").collect()
    }
    # doc 1 has 3 distinct shingles, exactly one in the probe set
    assert got == {1: (1, 3)}


def test_decontaminate_is_case_insensitive(spark):
    corpus = _docs(spark, [(1, "ALPHA BETA GAMMA")])
    probe = _docs(spark, [(9, "alpha beta gamma")])
    assert decontaminate(corpus, probe, "id", "text").count() == 1


def test_bm25_hand_computed(spark):
    corpus = _docs(spark, [(1, "a a b"), (2, "a c d"), (3, "x y z")])
    got = {r["id"]: r["score"] for r in bm25_scores(corpus, "id", "text", ["a"]).collect()}
    # N=3, avgdl=3, df(a)=2 -> idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    idf = math.log(1.6)
    # dl=3=avgdl so the length norm is k1: tf*(k1+1)/(tf+k1)
    assert set(got) == {1, 2}  # doc 3 has no query term
    assert got[1] == pytest.approx(idf * 2 * 2.2 / (2 + 1.2))
    assert got[2] == pytest.approx(idf * 1 * 2.2 / (1 + 1.2))


def test_bm25_multi_term_sums_contributions(spark):
    corpus = _docs(spark, [(1, "a b"), (2, "a x")])
    one = {r["id"]: r["score"] for r in bm25_scores(corpus, "id", "text", ["a"]).collect()}
    two = {r["id"]: r["score"] for r in bm25_scores(corpus, "id", "text", ["a", "b"]).collect()}
    assert two[1] > one[1]  # doc 1 gains the 'b' contribution
    assert two[2] == pytest.approx(one[2])  # doc 2 unchanged


def test_normalize_text_unicode_canonical(spark):
    """Composed and decomposed forms must normalize to identical
    bytes (the property that keeps dedup hashes honest), zero-width
    and control characters vanish, whitespace collapses, NULLs pass
    through, and the pass is idempotent."""
    from cds_etl_spark.operators.text_analysis import normalize_text

    composed = "Café Noël"           # é, ë precomposed
    decomposed = "Café Noël"        # e + combining marks
    messy = "a​b­c\x07d   e\t f"      # zw, soft hyphen, BEL
    rows = [(1, composed), (2, decomposed), (3, messy), (4, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["text"] for r in normalize_text(df).collect()}
    assert out[1] == out[2] == "café noël"
    assert out[3] == "abc d e f"
    assert out[4] is None
    # Idempotent: a second pass changes nothing.
    once = normalize_text(df)
    twice = normalize_text(once)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
