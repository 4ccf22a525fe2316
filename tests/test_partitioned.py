"""Partition-pruning plan tests: static pruning (predicate on the
partition column prunes directories before any file read) and dynamic
partition pruning (a dim-side filter prunes the fact scan at runtime).
These are read-elimination guarantees — the 100 TB analogue is scanning
one day, not seven years."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.sources.partitioned import read_partitioned, write_partitioned


@pytest.fixture(scope="module")
def part_events(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("part") / "events_by_day")
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    write_partitioned(e, root, ["day"])
    return root


def test_static_partition_pruning(spark, sf_dir, part_events):
    e = read_partitioned(spark, part_events)
    one_day = e.filter(F.col("day") == "2024-01-02")
    p = one_day._jdf.queryExecution().executedPlan().toString()
    # The day predicate must appear as a PartitionFilter (directory
    # pruning), NOT as a post-scan data filter.
    assert "PartitionFilters" in p
    pf = p.split("PartitionFilters")[1][:200]
    assert "day" in pf
    assert "PushedFilters: [IsNotNull(day)" not in p
    # Count parity with the unpartitioned source.
    raw = load_table(spark, sf_dir, "events").filter(
        F.to_date(F.col("ts")) == "2024-01-02"
    )
    assert one_day.count() == raw.count()


def test_dynamic_partition_pruning(spark, part_events):
    """Join against a filtered in-memory dim: the fact scan's
    PartitionFilters must contain a dynamicpruning subquery so only
    the dim's surviving days are read."""
    e = read_partitioned(spark, part_events)
    days = sorted(r[0] for r in e.select("day").distinct().collect())
    # DPP's insertion rule demands (a) a file-relation dim — an
    # in-memory LogicalRDD has no size stats, so the benefit heuristic
    # rejects — and (b) a "likely selective" dim predicate (equality /
    # IN / LIKE); a bare boolean column does not qualify.
    dim_path = part_events + "_dim"
    spark.createDataFrame(
        [(d, "keep" if i % 2 == 0 else "drop") for i, d in enumerate(days)],
        "day date, flag string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    # Broadcast-hint the dim: at test scale the planner would otherwise
    # broadcast the (tiny) fact side, and DPP only fires when the
    # filtered dim is the build side probing a partitioned fact scan.
    joined = e.join(F.broadcast(dim.filter(F.col("flag") == "keep")), "day")
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower(), f"expected DPP in plan:\n{p[:2000]}"
    kept_days = {d for i, d in enumerate(days) if i % 2 == 0}
    expect = e.filter(F.col("day").isin([str(d) for d in kept_days])).count()
    assert joined.count() == expect


def test_partition_columns_recovered_on_read(spark, part_events):
    e = read_partitioned(spark, part_events)
    assert "day" in e.columns
    assert dict(e.dtypes)["day"] == "date"
