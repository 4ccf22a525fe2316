"""Standing shingle-gram table (operators/shingle_index.py).

Contract: every consumer run off the index is value-identical to the
same algorithm run inline over the corpus text — the index changes
WHERE the explode is paid (once, at ingest), never the answer. The
hash family differs from the md5 oracle vehicles (xxhash64), so
equivalence is asserted against the inline Spark implementations,
which is the stronger check anyway (same engine, same tokenizer).
"""

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.shingle_index import (
    build_shingle_index,
    decontaminate_indexed,
    duplicate_spans_indexed,
    read_shingle_index,
    winnow_from_index,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_duplicate_spans_match_inline_query(spark, sf_dir, docs, tmp_path):
    # qs135's signal (k=10 spans, >1 occurrence across >1 doc) computed
    # off the standing table must equal the inline md5-oracle query's
    # output row-for-row: same groups (both hash families are
    # collision-free at this scale), same counts, same first positions.
    from cds_etl_spark.plans import QUERIES

    idx = str(tmp_path / "shidx10")
    build_shingle_index(docs, idx, k=10)
    indexed = duplicate_spans_indexed(spark, idx).select(
        "doc_id", "n_dup_spans", "first_pos"
    )
    inline = QUERIES["qs135_duplicate_spans"](spark, sf_dir).select(
        "doc_id",
        F.col("n_dup_spans").cast("long"),
        F.col("first_pos").cast("long"),
    )
    assert _rows(indexed) == _rows(inline)


def test_winnow_from_index_equals_inline(spark, sf_dir, docs, tmp_path):
    from cds_etl_spark.operators.dedup import winnow_fingerprints

    idx = str(tmp_path / "shidx5")
    build_shingle_index(docs, idx, k=5)
    indexed = winnow_from_index(spark, idx, w=4)
    inline = winnow_fingerprints(docs, k=5, w=4).select(
        "doc_id", "fp", "pos"
    )
    assert _rows(indexed.select("doc_id", "fp", "pos")) == _rows(inline)


def test_decontaminate_indexed_equals_inline(spark, sf_dir, docs, tmp_path):
    from cds_etl_spark.operators.retrieval import decontaminate

    # Benchmark = a slice of the corpus itself -> guaranteed overlap.
    probe = docs.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "shidx3")
    build_shingle_index(docs, idx, k=3, lowercase=True)
    indexed = decontaminate_indexed(spark, idx, probe, k=3, lowercase=True)
    inline = decontaminate(docs, probe, "doc_id", "text", n=3)
    assert indexed.count() > 0
    assert _rows(indexed) == _rows(
        inline.select("doc_id", "n_shared", "n_shingles")
    )


def test_append_extends_index(spark, docs, tmp_path):
    # Continuous-ingest path: building in two halves = building once.
    idx_a = str(tmp_path / "whole")
    idx_b = str(tmp_path / "halves")
    build_shingle_index(docs, idx_a, k=5)
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    build_shingle_index(h1, idx_b, k=5)
    build_shingle_index(h2, idx_b, k=5, mode="append")
    assert _rows(read_shingle_index(spark, idx_a)) == _rows(
        read_shingle_index(spark, idx_b)
    )


def test_replay_guard_dedups_reappended_epoch(spark, docs, tmp_path):
    # A crash-replayed epoch re-appends identical gram rows; readers
    # must see keep-any semantics, not doubled span counts.
    idx = str(tmp_path / "replay")
    batch = docs.limit(50)
    build_shingle_index(batch, idx, k=5)
    build_shingle_index(batch, idx, k=5, mode="append")  # the replay
    once = str(tmp_path / "once")
    build_shingle_index(batch, once, k=5)
    assert _rows(read_shingle_index(spark, idx)) == _rows(
        read_shingle_index(spark, once)
    )


def test_perplexity_tiers_indexed_equals_inline(
    spark, sf_dir, docs, tmp_path
):
    # qs157 off the standing k=1 lowercase table must reproduce the
    # inline string-keyed query exactly (hash-collision-free corpus,
    # single-space tokenization).
    from cds_etl_spark.operators.shingle_index import (
        perplexity_tiers_indexed,
    )
    from cds_etl_spark.plans import QUERIES

    idx = str(tmp_path / "k1lc")
    build_shingle_index(docs, idx, k=1, lowercase=True)
    got = _rows(perplexity_tiers_indexed(spark, idx, docs))
    want = _rows(QUERIES["qs157_perplexity_buckets"](spark, sf_dir))
    assert got == want
