#!/usr/bin/env python
"""Measure the pre-projected derived layout (sources/derived.py) at
scale — VERDICT r6 item 2 (the q2-family kernel lever).

Writes layout-matched copies of the affected tables (same Spark
rewrite, same file counts — ONLY the derived columns differ) so the
comparison isolates the projection cost, then times the consuming
queries warm (noop sink, best-of-N) against both directories:

    raw — Spark-rewritten copy, queries compute projections per row
    drv — same copy + derived columns, queries read them

Usage: python tools/derived_layout_experiment.py [gen_sf_dir]
       (default /tmp/cds_etl_spark_wh/gen/sf10)

Outcome lands in BASELINE.md (win or documented accept — the
deliverable is evidence either way).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.catalog import TABLES, load_table
from cds_etl_spark.plans import QUERIES
from cds_etl_spark.session import get_spark
from cds_etl_spark.sources.derived import DERIVED, with_derived

QUERY_RUNS = {
    "qs10_groupby_agg_tpch_q1": 5,
    "qs161_winsorized_mean": 5,
    "qs157_perplexity_buckets": 3,
}


def timed(df, runs):
    best = float("inf")
    w = df.write.format("noop").mode("overwrite")
    w.save()  # warm
    for _ in range(runs):
        t0 = time.perf_counter()
        w.save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cds_etl_spark_wh/gen/sf10"
    exp = os.path.join(os.path.dirname(src.rstrip("/")), "derived_exp")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.sparkContext.defaultParallelism
    for flavor in ("raw", "drv"):
        root = os.path.join(exp, flavor)
        os.makedirs(root, exist_ok=True)
        for t in TABLES:
            dst = os.path.join(root, f"{t}.parquet")
            if t in DERIVED:
                if os.path.exists(os.path.join(dst, "_SUCCESS")):
                    continue
                df = load_table(spark, src, t).repartition(n)
                if flavor == "drv":
                    df = with_derived(df, t)
                df.write.mode("overwrite").parquet(dst)
            elif not os.path.exists(dst):
                s = os.path.join(src, f"{t}.parquet")
                if os.path.exists(s):
                    os.symlink(s, dst)
    print(f"# layouts ready under {exp}", flush=True)
    for q, runs in QUERY_RUNS.items():
        r = timed(QUERIES[q](spark, os.path.join(exp, "raw")), runs)
        d = timed(QUERIES[q](spark, os.path.join(exp, "drv")), runs)
        print(
            f"{q}: raw {r:.4f} s  derived {d:.4f} s  "
            f"ratio {r / d:.2f}x  (best of {runs}, warm)",
            flush=True,
        )


if __name__ == "__main__":
    main()
