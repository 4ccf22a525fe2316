"""One-pass column profiler (operators/profiling.py)."""

from cds_etl_spark.operators.profiling import profile_columns


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", None)],
        "id long, s string, v double",
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"])
        for r in profile_columns(df, ["id", "s", "v"]).collect()
    }
    assert got == {
        "id": (4, 0, 4),
        "s": (4, 1, 2),   # distinct excludes NULL
        "v": (4, 2, 1),
    }


def test_profile_is_single_job_shape(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    plan = (
        profile_columns(df, ["id", "s"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one Aggregate over an Expand — not N per-column subplans
    assert plan.count("Expand") == 1
