"""SparkSession factory for the engine.

Single place where execution-relevant configuration lives. The settings
are chosen for correctness-vs-oracle (UTC session time zone, ANSI off so
overflow/parse behavior is permissive like the reference pandas code)
and for scale (AQE on with partition coalescing and skew-join handling,
shuffle partitions sized to the local core count; on a real cluster the
same settings let AQE re-plan to the data).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs every engine session needs, whether we build the session or an
# external harness hands us one (see `ensure_session_confs`). All of
# these are runtime-settable (non-static) SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    # Oracle comparability: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # The `events` table stores parquet TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so read as epoch-nanos long and convert
    # in the catalog layer (catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime re-planning, partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalesce post-shuffle partitions to the advisory size instead of
    # fanning out to maximize parallelism (the Spark docs' recommended
    # production setting): small shuffles collapse to few tasks instead
    # of `shuffle.partitions` mostly-empty ones.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # With parallelismFirst off, coalescing honors the advisory size.
    # The 64 MB default is tuned for IO-bound scans; post-shuffle work
    # here (window sorts, collect_set apply) is CPU-bound, so a 64 MB
    # target collapses small-but-hot shuffles onto one core. 8 MB keeps
    # those parallel (measured ~25% on window/agg shapes at sf0.1)
    # while still coalescing away mostly-empty partitions at scale.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A static conf on some build — leave the session's value.
            pass
    return spark


def get_spark(app_name: str = "cds_etl_spark", cores: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    local[N] for tests/bench; on a cluster the master/deploy settings
    come from spark-submit and everything here still applies.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_session_confs(spark)
