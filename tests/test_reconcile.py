"""Table diff + anonymization (operators/reconcile.py)."""

from pyspark.sql import functions as F

from cds_etl_spark.operators.reconcile import (
    anonymize,
    band_numeric,
    hash_column,
    mask_keep_last,
    table_diff,
)


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


def test_diff_classifies_all_statuses(spark):
    old = _t(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _t(spark, [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0)])
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diff_is_null_safe(spark):
    old = _t(spark, [(1, None, 1.0), (2, None, 2.0)])
    new = _t(spark, [(1, None, 1.0), (2, "now-set", 2.0)])
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_anonymize_policy(spark):
    df = spark.createDataFrame(
        [(1, "alice", "555-123-9876", 2345.6)],
        "id long, name string, phone string, bal double",
    )
    out = anonymize(
        df,
        {
            "name": hash_column("name", salt="s"),
            "phone": mask_keep_last("phone", 4),
            "bal": band_numeric("bal", 1000),
        },
    ).first()
    assert out["id"] == 1  # unlisted columns untouched
    assert len(out["name"]) == 64 and out["name"] != "alice"
    assert out["phone"] == "********9876"
    assert out["bal"] == 2000.0
    # salted hash is stable: same input + salt -> same digest (joinable)
    again = anonymize(df, {"name": hash_column("name", salt="s")}).first()["name"]
    assert again == out["name"]


def test_mask_shorter_than_keep_is_unmasked(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    assert anonymize(df, {"s": mask_keep_last("s", 4)}).first()["s"] == "abc"
