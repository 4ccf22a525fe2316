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


def test_rag_chunks_multi_chunk_and_tail_rules(spark, tmp_path):
    """qs136 on synthetic LONG documents (the shipped corpus is all
    single-chunk): multi-chunk layout, the containment rule (a tail
    inside the previous overlap is not emitted), and Spark/DuckDB
    agreement on the same parquet."""
    import duckdb
    import pandas as pd

    from cds_etl_spark.plans import ORACLE_SQL, QUERIES

    rows = []
    for doc_id, n in [("d1", 5), ("d2", 128), ("d3", 129), ("d4", 224),
                      ("d5", 225), ("d6", 500)]:
        rows.append((doc_id, " ".join(f"t{i}" for i in range(n)), "en", "s", n))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    out = QUERIES["qs136_rag_chunks"](spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    counts = {d: len(v) for d, v in by_doc.items()}
    # n<=128 -> 1 chunk; 129..224 -> 2; 225 -> 3 (third adds token 225);
    # 500 -> ceil((500-128)/96)+1 = 5
    assert counts == {"d1": 1, "d2": 1, "d3": 2, "d4": 2, "d5": 3, "d6": 5}
    d6 = sorted(by_doc["d6"], key=lambda r: r["chunk_idx"])
    assert [r["start_pos"] for r in d6] == [1, 97, 193, 289, 385]
    assert [r["chunk_len"] for r in d6] == [128, 128, 128, 128, 116]
    # full coverage, overlap 32 between consecutive chunks
    assert d6[-1]["start_pos"] + d6[-1]["chunk_len"] - 1 == 500

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = sorted(
        tuple(r) for r in con.sql(ORACLE_SQL["qs136_rag_chunks"]).fetchall()
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_pos"], r["chunk_len"], r["chunk_id"])
        for r in out
    )
    assert got == oracle


def test_duplicate_spans_on_exact_dup_docs(spark, tmp_path):
    """qs135 on docs with exact duplicates and shared tails — the case
    that exposed the oracle's off-by-one window bound (a truncated
    9-token tail window the Spark side never generates)."""
    import duckdb
    import pandas as pd

    from cds_etl_spark.plans import ORACLE_SQL, QUERIES

    t10 = " ".join(f"w{i}" for i in range(10))
    rows = [
        ("a", t10, "en", "s", len(t10)),          # exact dup pair: 1 window each
        ("b", t10, "en", "s", len(t10)),
        ("c", "x " + t10, "en", "s", 0),           # shares a's full window
        ("d", " ".join(f"u{i}" for i in range(9)), "en", "s", 0),  # 9 tokens: no window
        ("e", "unique " * 12, "en", "s", 0),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = sorted(
        (r["doc_id"], r["n_dup_spans"], r["first_pos"])
        for r in QUERIES["qs135_duplicate_spans"](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = sorted(tuple(r) for r in con.sql(ORACLE_SQL["qs135_duplicate_spans"]).fetchall())
    assert got == oracle
    assert got == [("a", 1, 1), ("b", 1, 1), ("c", 1, 2)]
