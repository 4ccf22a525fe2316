"""JSON-lines and ORC roundtrips (sources/files.py) with pushdown."""

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.sources.files import read_jsonl, read_orc, write_jsonl, write_orc


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    p = write_jsonl(src, str(tmp_path / "nation_json"))
    back = read_jsonl(spark, p, schema=src.schema)
    assert _rows(back) == _rows(src)


def test_orc_roundtrip_and_filter_pushdown(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    p = write_orc(src, str(tmp_path / "orders_orc"))
    back = read_orc(spark, p)
    assert back.count() == src.count()
    q = back.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # filter reaches the ORC scan; projection prunes to the two
    # referenced columns
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    assert q.count() == src.filter(F.col("o_totalprice") > 300000).count()


def test_read_jsonl_quarantine(spark, tmp_path):
    """Malformed and schema-violating lines land in the quarantine
    with their raw text; clean rows come back typed; a fully-clean
    file quarantines nothing."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cds_etl_spark.sources.files import read_jsonl_quarantine

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken json!!\n"
        '{"id": "not-a-number", "name": "bad-type"}\n'
        '{"id": 2, "name": "also ok"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    qdir = str(tmp_path / "quarantine")
    good = read_jsonl_quarantine(spark, str(src), schema, qdir)
    rows = {(r["id"], r["name"]) for r in good.collect()}
    assert rows == {(1, "ok"), (2, "also ok")}
    bad = spark.read.json(qdir).collect()
    raws = {r["raw"] for r in bad}
    assert "{broken json!!" in raws
    assert any("not-a-number" in r for r in raws)
    assert len(bad) == 2
    assert all(str(src).endswith(r["source_file"].split("/")[-1]) for r in bad)
    # Clean file: nothing quarantined.
    src2 = tmp_path / "clean.jsonl"
    src2.write_text('{"id": 9, "name": "x"}\n')
    q2 = str(tmp_path / "q2")
    good2 = read_jsonl_quarantine(spark, str(src2), schema, q2)
    assert good2.count() == 1
    import os
    assert not os.path.exists(q2) or spark.read.json(q2).count() == 0
