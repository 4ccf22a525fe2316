#!/usr/bin/env python
"""Measure the standing shingle-gram table (operators/shingle_index.py)
against the inline formulations — VERDICT r6 item 3 (the stated "next
lever": stop re-exploding the corpus for span/winnowing dedup and
decontamination).

Three consumers, each timed warm (noop sink, best-of-N):

    winnow     inline  = winnow_fingerprints + winnow_match
               indexed = winnow_from_index + winnow_match
    spans      inline  = the qs135 span computation (xxhash64 family,
                         same shape as duplicate_spans_indexed)
               indexed = duplicate_spans_indexed
    decontam   inline  = retrieval.decontaminate
               indexed = decontaminate_indexed

plus the one-time build cost (the amortized ingest payment).

Usage: python tools/shingle_index_experiment.py [gen_sf_dir]
       (default /tmp/cds_etl_spark_wh/gen/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.dedup import winnow_fingerprints, winnow_match
from cds_etl_spark.operators.retrieval import decontaminate
from cds_etl_spark.operators.shingle_index import (
    _gram_rows,
    build_shingle_index,
    decontaminate_indexed,
    duplicate_spans_indexed,
    winnow_from_index,
)
from cds_etl_spark.session import get_spark

RUNS = 3


def timed(label, df, runs=RUNS):
    best = float("inf")
    w = df.write.format("noop").mode("overwrite")
    w.save()  # warm
    for _ in range(runs):
        t0 = time.perf_counter()
        w.save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f} s (best of {runs}, warm)", flush=True)
    return best


def spans_inline(docs):
    # qs135's shape in the production (xxhash64) family — identical
    # algorithm to duplicate_spans_indexed, corpus explode inline.
    grams = _gram_rows(docs, "doc_id", "text", 10, False)
    dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"), F.countDistinct("doc_id").alias("_nd"))
        .filter((F.col("_n") > 1) & (F.col("_nd") >= 2))
        .select("h")
    )
    return (
        grams.join(dup, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"), F.min("pos").alias("first_pos"))
    )


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cds_etl_spark_wh/gen/sf1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, src, "documents")
    n = spark.sparkContext.defaultParallelism
    docs = docs.repartition(n).localCheckpoint()  # equal multi-part input
    probe = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    root = os.path.join(os.path.dirname(src.rstrip("/")), "shingle_exp")
    idx10 = os.path.join(root, "k10")
    idx5 = os.path.join(root, "k5")
    idx3 = os.path.join(root, "k3lc")
    t0 = time.perf_counter()
    build_shingle_index(docs, idx10, k=10)
    b10 = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_shingle_index(docs, idx5, k=5)
    b5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_shingle_index(docs, idx3, k=3, lowercase=True)
    b3 = time.perf_counter() - t0
    print(f"build k=10 {b10:.3f} s, k=5 {b5:.3f} s, k=3lc {b3:.3f} s", flush=True)

    timed("spans    inline ", spans_inline(docs))
    timed("spans    indexed", duplicate_spans_indexed(spark, idx10))
    timed(
        "winnow   inline ",
        winnow_match(winnow_fingerprints(docs, k=5, w=4), min_shared=3),
    )
    timed(
        "winnow   indexed",
        winnow_match(winnow_from_index(spark, idx5, w=4), min_shared=3),
    )
    timed("decontam inline ", decontaminate(docs, probe, "doc_id", "text", n=3))
    timed("decontam indexed", decontaminate_indexed(spark, idx3, probe, k=3, lowercase=True))


if __name__ == "__main__":
    main()
