"""Historical-value state (O28/O29).

Reference (`add_historical_value` cds_transformation_functions.py:420-445,
`print_historical_value` :448-466): per configured (node, property),
the current comma-joined value list is union-merged into a YAML
key→values store keyed by the node id, sorted descending, and the
emitted study table is re-stamped with the full comma-joined history.

Engine re-expression: the store is a parquet state table
(key string, value string) and the merge is pure DataFrame algebra —
union + collect_set — i.e. the MERGE-INTO upsert pattern without
requiring Delta. Re-stamping is a broadcast join against the
aggregated history instead of a re-read-rewrite of emitted TSVs."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NodeTables = dict[str, DataFrame]

STATE_SCHEMA = "key string, value string"


def _rm(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.remove(path)


def _read_state(spark: SparkSession, path: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], STATE_SCHEMA)


def add_historical_value(
    df: DataFrame, key_col: str, value_col: str, state_path: str
) -> None:
    """Merge this batch's values into the state table.

    The batch side contributes (key, exploded trimmed values); the
    merge is a distinct union — idempotent re-runs, no read-modify-
    write loop per key like the reference's YAML rewrite."""
    spark = df.sparkSession
    batch = df.select(
        F.col(f"`{key_col}`").cast("string").alias("key"),
        F.explode(F.split(F.col(f"`{value_col}`").cast("string"), ",")).alias("value"),
    ).select("key", F.trim("value").alias("value")).filter(F.col("value") != "")
    merged = _read_state(spark, state_path).unionByName(batch).distinct()
    # Small state (one row per historical value per study). Spark-native
    # rewrite: stage to a sibling temp dir, then swap into place — the
    # write materializes into the *temp* path, so the lazy read of the
    # current state above is never overwritten mid-scan, and a crash
    # between the renames leaves either the old or the new state intact.
    tmp, old = state_path + ".tmp", state_path + ".old"
    _rm(tmp)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    _rm(old)
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    _rm(old)


def stamp_historical_value(
    df: DataFrame, key_col: str, value_col: str, state_path: str
) -> DataFrame:
    """Overwrite `value_col` with the full comma-joined history,
    sorted descending (reference sorts reverse=True, :443)."""
    spark = df.sparkSession
    history = (
        _read_state(spark, state_path)
        .groupBy("key")
        .agg(
            F.array_join(F.reverse(F.array_sort(F.collect_set("value"))), ",").alias("_hist")
        )
    )
    joined = df.join(
        F.broadcast(history), F.col(f"`{key_col}`").cast("string") == F.col("key"), "left"
    )
    return joined.withColumn(
        value_col, F.coalesce(F.col("_hist"), F.col(f"`{value_col}`"))
    ).drop("key", "_hist")
