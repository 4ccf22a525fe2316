"""bucketed_prefix_sum must be bit-identical to the serial global
window it replaces — the whole point is changing ONLY the physical
plan (parallel range buckets + exclusive offsets) while the exact
integer running totals stay the same."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from cds_etl_spark.operators.prefix import (
    bucketed_prefix_sum,
    midrank2,
)


def _serial(df, order_col, weight_col, out_col, part_cols=()):
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(weight_col).over(w))


@pytest.mark.parametrize("n_buckets", [1, 7, 64])
def test_prefix_sum_matches_serial_window(spark, n_buckets):
    rng = random.Random(271)
    # Distinct keys with weights, deliberately clumped so buckets
    # receive uneven loads (including empty buckets).
    keys = rng.sample(range(-500, 4000), 600)
    rows = [Row(v=k, c=rng.randint(1, 9)) for k in keys]
    df = spark.createDataFrame(rows)
    got = (
        bucketed_prefix_sum(df, "v", "c", "cum", n_buckets=n_buckets)
        .orderBy("v")
        .collect()
    )
    want = _serial(df, "v", "c", "cum").orderBy("v").collect()
    assert [(r.v, r.c, r.cum) for r in got] == [
        (r.v, r.c, r.cum) for r in want
    ]


def test_prefix_sum_grouped_matches_serial(spark):
    rng = random.Random(272)
    rows = []
    for g in ("a", "b", "c"):
        for k in rng.sample(range(0, 100000), 400):
            rows.append(Row(g=g, v=k, c=rng.randint(1, 5)))
    df = spark.createDataFrame(rows)
    got = (
        bucketed_prefix_sum(
            df, "v", "c", "cum", part_cols=("g",), n_buckets=32
        )
        .orderBy("g", "v")
        .collect()
    )
    want = (
        _serial(df, "v", "c", "cum", part_cols=("g",))
        .orderBy("g", "v")
        .collect()
    )
    assert [(r.g, r.v, r.cum) for r in got] == [
        (r.g, r.v, r.cum) for r in want
    ]


def test_prefix_sum_single_value_range(spark):
    # mx == mn: every row lands in bucket 0 and the offset join
    # must still produce the serial result.
    df = spark.createDataFrame([Row(v=7, c=3)])
    out = bucketed_prefix_sum(df, "v", "c", "cum").collect()
    assert [(r.v, r.cum) for r in out] == [(7, 3)]


def test_midrank2_matches_rank_formula(spark):
    # 2*avg_rank over values with ties == 2*RANK + ties - 1.
    rng = random.Random(273)
    vals = [rng.randint(0, 50) for _ in range(500)]
    base = spark.createDataFrame([Row(v=v) for v in vals])
    vc = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r.v: r.mr2
        for r in midrank2(vc, "v", "c", "mr2", n_buckets=8).collect()
    }
    w = Window.orderBy("v")
    want = {
        r.v: r.mr2
        for r in base.select(
            "v",
            (
                2 * F.rank().over(w)
                + F.count(F.lit(1)).over(Window.partitionBy("v"))
                - 1
            ).alias("mr2"),
        )
        .distinct()
        .collect()
    }
    assert got == want
