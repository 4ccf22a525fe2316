#!/usr/bin/env python
"""sf10 kernel experiments for the two honest kernel gaps (VERDICT r5
next-round item 8): q2 (TPC-H Q1 agg, 2.36x vs DuckDB sequential) and
q4 (two-string distinct, 3.6x).

Variants measured (warm best-of-N over the ingested sf10 warehouse):

q2 family
  base          — current qs10 plan over the range-layout lineitem
  cents-layout  — lineitem pre-projected at ingest with money/qty as
                  BIGINT cents (decimal-as-long): the per-row double
                  CAST(x*100+0.5 AS BIGINT) moves to ingest time, the
                  scan reads longs, the agg is pure long arithmetic
  batchsize-16k — columnarReaderBatchSize 16384 (cache-resident
                  batches vs default 4096)

q4 family
  base          — current distinct over (o_orderpriority, o_orderstatus)
  twolevel-vec  — vectorized two-level codegen hash map explicitly on
  presplit-agg  — groupBy instead of dropDuplicates (same plan shape
                  check; distinct IS a groupBy, expect parity)

Outcomes land in BASELINE.md prose (win or no-win — the deliverable is
evidence, not necessarily a speedup). Usage:
  python tools/kernel_experiments_sf10.py /tmp/cds_etl_spark_wh/gen/sf10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cds_etl_spark.session import get_spark

RUNS = 5


def timed(label, writer):
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        writer.save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.4f} s", flush=True)
    return best


def q1_agg(li):
    qty_c = (F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    prc_c = (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty_c).cast("double") / 100).alias("sq"),
        (F.sum(prc_c).cast("double") / 100).alias("sp"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("disc"),
        F.count(F.lit(1)).alias("c"),
    )


def q1_agg_cents(li):
    # cents columns already long; disc needs price*(1-disc) — exact in
    # 1e-4 integer units from the cents columns.
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("l_quantity_c").cast("double") / 100).alias("sq"),
        (F.sum("l_extendedprice_c").cast("double") / 100).alias("sp"),
        (
            F.sum(F.col("l_extendedprice_c") * (F.lit(100) - F.col("l_discount_c")))
            .cast("double")
            / 10000
        ).alias("disc"),
        F.count(F.lit(1)).alias("c"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cds_etl_spark_wh/gen/sf10"
    data_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(sf_dir)
        for f in fs
    )
    spark = get_spark("kernel_exp", local_latency=True, data_bytes=data_bytes)
    li_raw = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o_raw = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    wh = "/tmp/cds_etl_spark_wh/kernel_exp"
    flat = os.path.join(wh, "lineitem_flat.parquet")
    cents = os.path.join(wh, "lineitem_cents.parquet")
    if not os.path.exists(os.path.join(flat, "_SUCCESS")):
        li_raw.repartition(32).write.mode("overwrite").parquet(flat)
    if not os.path.exists(os.path.join(cents, "_SUCCESS")):
        (
            li_raw.select(
                "l_returnflag",
                "l_linestatus",
                (F.col("l_quantity") * 100 + F.lit(0.5)).cast("long").alias("l_quantity_c"),
                (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("l_extendedprice_c"),
                (F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("l_discount_c"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(cents)
        )
    ords = os.path.join(wh, "orders_flat.parquet")
    if not os.path.exists(os.path.join(ords, "_SUCCESS")):
        o_raw.repartition(16).write.mode("overwrite").parquet(ords)

    li = spark.read.parquet(flat)
    li_c = spark.read.parquet(cents)
    o = spark.read.parquet(ords)

    w = lambda df: df.write.format("noop").mode("overwrite")  # noqa: E731

    # warm-up
    for df in (q1_agg(li), q1_agg_cents(li_c), o.select("o_orderpriority", "o_orderstatus").distinct()):
        for _ in range(2):
            w(df).save()

    print("== q2 family (sf10 lineitem) ==")
    timed("q2 base (double->cents per row)", w(q1_agg(li)))
    timed("q2 cents-layout (long scan)", w(q1_agg_cents(li_c)))
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
    timed("q2 base batchsize-16k", w(q1_agg(li)))
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")

    print("== q4 family (sf10 orders) ==")
    q4 = o.select("o_orderpriority", "o_orderstatus").distinct()
    timed("q4 base", w(q4))
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    timed("q4 twolevel-vec", w(q4))
    spark.conf.unset("spark.sql.codegen.aggregate.map.vectorized.enable")
    q4b = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.lit(1)).select(
        "o_orderpriority", "o_orderstatus"
    )
    timed("q4 groupBy formulation", w(q4b))

    spark.stop()


if __name__ == "__main__":
    main()
