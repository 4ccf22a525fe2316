#!/usr/bin/env python
"""Re-measure the persisted-index hot-band cells (BASELINE r12 skew
audit) under the r13 SELF-ARMING guard: build-time band_stats overhead
and the default "auto" probe on healthy vs 1%-hot-template indexes,
same fixture protocol as r12 (skew/sf10 docs = 500k, 5000-copy
template at 1%, probe batch 2000 with 250 template copies, warm).

Usage: python tools/index_guard_remeasure.py [skew_sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cds_etl_spark.operators.dedup import (
    build_minhash_index,
    probe_minhash_index,
)
from cds_etl_spark.session import get_spark

SKEW = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cds_etl_spark_wh/skew/sf10"
WORK = "/tmp/cds_etl_spark_wh/guard_r13"
TPL = (
    "the exact template text repeated verbatim across the hot corpus "
    "partition in every single copy of the boilerplate block ok"
)


def timed(label, fn, runs=2):
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:8.2f} s   {out if out is not None else ''}")
    return best, out


def main():
    spark = get_spark()
    docs = spark.read.parquet(f"{SKEW}/documents.parquet").select(
        "doc_id", "text"
    )
    hot = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 100 == 0, F.lit(TPL)).otherwise(
            F.col("text")
        ),
    )
    # 2000-row probe batch with 250 template copies (ids remapped out
    # of the index's id space).
    batch = (
        docs.limit(2000)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 8 == 0, F.lit(TPL)).otherwise(
                F.col("text")
            ),
        )
        .localCheckpoint(eager=True)
    )
    n_tpl = batch.filter(F.col("text") == TPL).count()
    print(f"probe batch: {batch.count()} rows, {n_tpl} template copies")

    for name, src in (("uniform", docs), ("hot1pct", hot)):
        path = f"{WORK}/{name}"
        timed(f"build {name} (band_stats=True, r13 default)",
              lambda: build_minhash_index(src, path))
        timed(f"build {name} (band_stats=False, legacy)",
              lambda: build_minhash_index(src, f"{path}_nostats",
                                          band_stats=False))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            timed(
                f"probe {name} auto (r13 default)",
                lambda: probe_minhash_index(spark, batch, path).count(),
            )
            timed(
                f"probe {name} uncapped (legacy None)",
                lambda: probe_minhash_index(
                    spark, batch, path, max_band_entries=None
                ).count(),
            )
            timed(
                f"probe {name} explicit cap 64 (r12 cell)",
                lambda: probe_minhash_index(
                    spark, batch, path, max_band_entries=64
                ).count(),
            )
    spark.stop()


if __name__ == "__main__":
    main()
