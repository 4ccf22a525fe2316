"""Small-file compaction — bin-pack a parquet dataset toward a target
file size.

Micro-batch sinks (streaming/ops.foreach_batch_partitioned_sink) and
incremental ingests accumulate many small files; at scale, scan cost
becomes dominated by per-file open/footer overhead and driver-side
listing, not bytes. Compaction is the maintenance pass every
lakehouse runs (Delta OPTIMIZE, Iceberg rewrite_data_files),
re-expressed with stock Spark: size the dataset through the Hadoop
FileSystem API (portable to s3a/hdfs/abfs — no os.walk), pick a file
count from the byte total, and rewrite in one job.

The rewrite targets a NEW directory: an in-place overwrite that fails
midway destroys the dataset, while write-then-swap is atomic at the
directory-rename level on HDFS (and handled by table-format commits
where available). The caller owns the swap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of data files under ``path`` via the Hadoop
    FileSystem API (works on any supported scheme, not just local)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            total += f.getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
) -> DataFrame:
    """Rewrite the parquet dataset at ``path`` into ``out_path`` as
    ``ceil(total_bytes / target_mb)`` files; returns the compacted
    scan. One shuffle-free coalesce when shrinking the file count
    (the common case), a repartition otherwise."""
    df = spark.read.parquet(path)
    total = dataset_bytes(spark, path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    current = df.rdd.getNumPartitions()
    sized = df.coalesce(n) if n <= current else df.repartition(n)
    sized.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
