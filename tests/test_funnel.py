"""Funnel matching (operators/funnel.py): ordering, horizon, depth."""

import datetime

from pyspark.sql import functions as F

from cds_etl_spark.operators.funnel import funnel

T = datetime.datetime


def _steps():
    return [
        ("a", F.col("et") == "a"),
        ("b", F.col("et") == "b"),
        ("c", F.col("et") == "c"),
    ]


def _run(spark, rows, horizon=None):
    df = spark.createDataFrame(rows, "user long, ts timestamp, et string")
    out = funnel(df, "user", "ts", _steps(), horizon=horizon)
    return {r["user"]: (r["t_a"], r["t_b"], r["t_c"], r["depth"]) for r in out.collect()}


def test_full_conversion_uses_earliest_valid_matches(spark):
    rows = [
        (1, T(2024, 1, 1), "a"),
        (1, T(2024, 1, 2), "b"),
        (1, T(2024, 1, 3), "c"),
    ]
    got = _run(spark, rows)
    assert got[1] == (T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3), 3)


def test_step_before_previous_does_not_count(spark):
    # b happens BEFORE the first a: chain breaks at depth 1
    rows = [(1, T(2024, 1, 2), "a"), (1, T(2024, 1, 1), "b")]
    got = _run(spark, rows)
    assert got[1] == (T(2024, 1, 2), None, None, 1)


def test_horizon_bounds_each_step(spark):
    rows = [
        (1, T(2024, 1, 1), "a"),
        (1, T(2024, 1, 9), "b"),  # 8 days after a: outside 7-day horizon
        (2, T(2024, 1, 1), "a"),
        (2, T(2024, 1, 5), "b"),  # inside
    ]
    got = _run(spark, rows, horizon="7 days")
    assert got[1][3] == 1
    assert got[2][3] == 2


def test_users_without_first_step_are_absent(spark):
    got = _run(spark, [(1, T(2024, 1, 1), "b")])
    assert got == {}
