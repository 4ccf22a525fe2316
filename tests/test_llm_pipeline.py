"""End-to-end LLM training-data pipeline (llm_pipeline.py): stage
invariants over the synthetic documents table."""

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.llm_pipeline import prepare_training_data


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.filter(F.col("doc_id") % 101 != 0)
    return corpus, probe, prepare_training_data(corpus, probe)


def test_stage_sizes_monotonically_shrink(spark, stages):
    corpus, _, s = stages
    n0 = corpus.count()
    n_filtered = s["filtered"].count()
    n_deduped = s["deduped"].count()
    n_clustered = s["clustered"].count()
    n_clean = s["clean"].count()
    assert n0 >= n_filtered >= n_deduped >= n_clustered >= n_clean
    assert n_clean > 0


def test_no_duplicate_texts_survive(spark, stages):
    _, _, s = stages
    dup = (
        s["deduped"]
        .groupBy(F.md5("text"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_no_contaminated_docs_survive(spark, stages):
    _, probe, s = stages
    from cds_etl_spark.operators.retrieval import decontaminate

    left = decontaminate(s["clean"], probe, "doc_id", "text").count()
    assert left == 0


def test_manifest_covers_clean_corpus_token_stream(spark, stages):
    _, _, s = stages
    # every clean doc with >0 tokens appears in the manifest, and each
    # shard's chunk ids are a gapless 0..max range
    n_docs = s["clean"].count()
    assert s["manifest"].select("doc_id").distinct().count() == n_docs
    per_shard = (
        s["manifest"]
        .groupBy("lang_guess")
        .agg(
            F.countDistinct("chunk_id").alias("n"),
            F.max("chunk_id").alias("mx"),
        )
        .collect()
    )
    assert per_shard
    for r in per_shard:
        assert r["n"] == r["mx"] + 1
