"""Bucketed-layout plan tests: the point of sources/bucketed is shuffle
ELISION, so the assertion is on the physical plan — a co-located join
and a bucket-key aggregation must contain no Exchange operator. Also
plan-shape checks for the sampling/sessionize operators (map-side-ness
is their scale contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.sampling import hash_sample, hash_split
from cds_etl_spark.operators.sessions import sessionize
from cds_etl_spark.sources.bucketed import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_wh")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bo = write_bucketed(
        spark, o, "b_orders", ["o_custkey"], 8,
        sort_cols=["o_custkey"], path=str(root / "b_orders"),
    )
    bc = write_bucketed(
        spark, c, "b_customer", ["c_custkey"], 8,
        sort_cols=["c_custkey"], path=str(root / "b_customer"),
    )
    yield bo, bc
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_no_shuffle(spark, sf_dir, bucketed):
    """Big-to-big co-located join: with broadcast off (as it would be
    for two fact-scale sides), the SortMergeJoin must read co-located
    buckets — no shuffle Exchange on either side."""
    bo, bc = bucketed
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
        "o_orderkey", "c_name"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange hashpartitioning" not in p, (
            f"bucketed join must not shuffle:\n{p}"
        )
        got = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # Row-level sanity vs the unbucketed join.
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    assert got == o.join(c, o.o_custkey == c.c_custkey).count()


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed):
    bo, _ = bucketed
    agg = bo.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    p = _plan(agg)
    assert "Exchange" not in p, f"bucket-key groupBy must not shuffle:\n{p}"
    assert "HashAggregate" in p


def test_mismatched_bucket_counts_still_correct(spark, sf_dir, bucketed, tmp_path):
    """A 4-bucket side joined to an 8-bucket side stays correct (Spark
    shuffles one side or coalesces buckets) — layout is an optimization,
    never a correctness dependency."""
    bo, _ = bucketed
    c = load_table(spark, sf_dir, "customer")
    bc4 = write_bucketed(
        spark, c, "b_customer4", ["c_custkey"], 4, path=str(tmp_path / "bc4")
    )
    try:
        got = bo.join(bc4, bo.o_custkey == bc4.c_custkey).count()
        o = load_table(spark, sf_dir, "orders")
        expect = o.join(c, o.o_custkey == c.c_custkey).count()
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_customer4")


def test_hash_sample_and_split_are_map_side(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    p = _plan(hash_sample(d, "doc_id", 0.1))
    assert "Exchange" not in p, "hash_sample must be a pure map-side filter"
    p2 = _plan(hash_split(d, "doc_id", {"a": 0.5, "b": 0.5}))
    assert "Exchange" not in p2, "hash_split must be a pure map-side project"


def test_sessionize_is_single_shuffle(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    p = _plan(sessionize(e, "user_id", "ts", tiebreak="event_id"))
    assert p.count("Exchange") == 1, f"sessionize = one user-key shuffle:\n{p}"
    assert "hashpartitioning(user_id" in p


def test_analyze_feeds_cbo_statistics(spark, sf_dir, tmp_path):
    from cds_etl_spark.catalog import analyze_tables, load_table

    out = str(tmp_path / "t_stats")
    load_table(spark, sf_dir, "nation").write.parquet(out)
    spark.sql("DROP TABLE IF EXISTS t_stats")
    spark.sql(f"CREATE TABLE t_stats USING parquet LOCATION '{out}'")
    try:
        plan_before = spark.table("t_stats")._jdf.queryExecution().optimizedPlan()
        assert plan_before.stats().rowCount().isEmpty()

        analyze_tables(spark, ["t_stats"], {"t_stats": ["n_nationkey", "n_name"]})
        plan = spark.table("t_stats")._jdf.queryExecution().optimizedPlan()
        n = load_table(spark, sf_dir, "nation").count()
        assert int(str(plan.stats().rowCount().get())) == n
        # column-level stats recorded with exact NDV for the key
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED t_stats n_nationkey"
            ).collect()
        }
        assert int(desc["distinct_count"]) == n
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stats")
