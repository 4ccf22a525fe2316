"""Bucketed warehouse layout — the storage-level shuffle eliminator.

At 100 TB the dominant cost of a keyed join or aggregation is the
shuffle of the fact table. Bucketing moves that shuffle to WRITE time,
once: rows are hash-partitioned into a fixed number of buckets by key
when the table is ingested, and every later join/groupBy on that key
reads co-located buckets instead of exchanging data — Spark's scan
reports the hash distribution, so Catalyst plans SortMergeJoin /
HashAggregate with NO Exchange on the bucketed side
(tests/test_bucketed.py asserts exactly that on the physical plan).

Design rules encoded here:
- Both sides of a co-located join must share bucket count and key
  (different counts re-introduce a shuffle on one side).
- Bucket count is chosen for the TARGET scale: ~(table size / desired
  per-task input). A 100 TB fact at 256 MB/task wants ~400k... in
  practice thousands of buckets; each bucket is still splittable by
  row group for map-parallelism, so err large, not small.
- ``sort_cols`` pre-sorts within buckets; with one file per bucket
  Spark can additionally elide the SortMergeJoin sort.

This replaces nothing in the reference (pandas has no storage layout);
it is the Spark-native answer to SURVEY.md §4.2 "co-locate joins via
bucketing or pre-partitioning".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | tuple[str, ...],
    num_buckets: int,
    sort_cols: list[str] | tuple[str, ...] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Ingest ``df`` as a bucketed catalog table and return its scan.

    Bucketing requires ``saveAsTable`` (plain ``.parquet(path)`` writes
    carry no bucket metadata); ``path`` makes it an external table so
    the warehouse location is explicit. The write itself shuffles by
    the bucket key — that is the one shuffle all downstream consumers
    are buying out of.
    """
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)
