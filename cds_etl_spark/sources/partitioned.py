"""Partitioned table layout — partition pruning, static and dynamic.

The other storage-level scan eliminator (bucketing, sources/bucketed,
kills shuffles; partitioning kills READS). A fact table partitioned by
a coarse time/tenant column turns every filtered scan into a directory
listing: a predicate on the partition column prunes whole directories
before any parquet footer is opened, and a JOIN against a filtered
dimension prunes at RUNTIME via dynamic partition pruning (Catalyst
plants a subquery-duplicate of the dim filter inside the fact scan's
PartitionFilters — `dynamicpruningexpression` in the plan, asserted in
tests/test_partitioned.py).

Partition-column choice rules encoded in the helper's contract:
- LOW cardinality (dates, regions, node types — not ids): each value
  is a directory; 10^6 directories is a metastore outage, not a layout.
- Coarse enough that per-partition data is many row groups, so the
  in-partition scan stays parallel.
- The reference's own output layout is the degenerate form of this:
  one TSV per node type per batch (print_data,
  cds_transformation_functions.py:106-122) ≙ partitionBy(batch, node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | tuple[str, ...],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` hive-style partitioned (``col=value/`` directories).

    Plain path-based write — readers get static pruning and DPP with no
    catalog dependency (`spark.read.parquet(path)` recovers partition
    columns from directory names).
    """
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
