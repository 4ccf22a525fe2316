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
