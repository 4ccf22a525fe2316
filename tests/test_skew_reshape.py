"""Skew + reshape utilities: salted shapes must be result-identical to
their unsalted equivalents; reshape ops must reproduce the reference's
transpose/horizontal-concat semantics (O15/O16)."""

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.projection import with_row_id
from cds_etl_spark.operators.reshape import pivot_key_value, replicate_to, zip_frames
from cds_etl_spark.operators.skew import salted_broadcast_join


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_salted_broadcast_join_equals_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey", "inner")
    salted = salted_broadcast_join(o, c, on="o_custkey", buckets=8, det_col="o_orderkey")
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)
    # Small side broadcast: the big side is never shuffled.
    assert "BroadcastHashJoin" in salted._jdf.queryExecution().executedPlan().toString()


def test_pivot_key_value_transpose(spark):
    # The v1.0 Study sheet shape: vertical key/value rows → one wide row
    # (cds-transformation.py:114-120).
    kv = spark.createDataFrame(
        [("phs_accession", "phs001"), ("study_name", "S1"), ("version", "v2")],
        "k string, v string",
    )
    [row] = pivot_key_value(kv, "k", "v", keys=["phs_accession", "study_name", "version"]).collect()
    assert row.asDict() == {"phs_accession": "phs001", "study_name": "S1", "version": "v2"}

    manifest = spark.createDataFrame([(1,), (2,), (3,)], "file_id int")
    wide = pivot_key_value(kv, "k", "v", keys=["phs_accession"])
    rep = replicate_to(wide, manifest)
    assert rep.count() == 3
    assert {r["phs_accession"] for r in rep.collect()} == {"phs001"}


def test_zip_frames_positional_concat(spark):
    a = with_row_id(spark.createDataFrame([("x",), ("y",)], "c1 string"))
    b = with_row_id(spark.createDataFrame([(10,), (20,)], "c2 int"))
    out = zip_frames(a, b).orderBy("_row_id").collect()
    assert [(r["c1"], r["c2"]) for r in out] == [("x", 10), ("y", 20)]
