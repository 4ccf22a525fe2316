"""Sequence packing (operators/packing.py): concat-and-chunk semantics."""

from pyspark.sql import functions as F

from cds_etl_spark.operators.packing import chunk_assignments


def _assign(spark, rows, budget, shard=None):
    df = spark.createDataFrame(rows, "id long, shard string, toks long")
    out = chunk_assignments(
        df, "id", "toks", budget, shard_col=shard, order_col="id"
    )
    return sorted(tuple(r) for r in out.collect())


def test_doc_straddles_chunk_boundary(spark):
    # tokens: 10 | 10 | 10  with budget 16:
    # doc1 [0,10) -> chunk 0; doc2 [10,20) -> chunks 0,1; doc3 [20,30) -> 1
    rows = [(1, "s", 10), (2, "s", 10), (3, "s", 10)]
    got = _assign(spark, rows, budget=16)
    assert got == [
        (1, 0, 10, 0),
        (2, 0, 10, 10),
        (2, 1, 10, 10),
        (3, 1, 10, 20),
    ]


def test_doc_longer_than_budget_spans_many_chunks(spark):
    got = _assign(spark, [(1, "s", 70)], budget=16)
    # [0,70) crosses chunks 0..4
    assert [r[1] for r in got] == [0, 1, 2, 3, 4]


def test_zero_token_docs_dropped_and_shards_independent(spark):
    rows = [(1, "a", 5), (2, "a", 0), (3, "b", 5)]
    got = _assign(spark, rows, budget=16, shard="shard")
    # shard-qualified output: (shard, id, chunk, toks, cum_before)
    assert got == [("a", 1, 0, 5, 0), ("b", 3, 0, 5, 0)]


def test_total_chunk_count_matches_token_total(spark):
    rows = [(i, "s", 7) for i in range(1, 41)]  # 280 tokens, budget 64
    got = _assign(spark, rows, budget=64)
    n_chunks = len({r[1] for r in got})
    assert n_chunks == (280 + 63) // 64  # ceil = 5
    # every chunk id in [0, 4] is present (no gaps in the stream)
    assert {r[1] for r in got} == set(range(5))
