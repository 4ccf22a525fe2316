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
    bucketed_row_number,
    ntile_from_rank,
    scalable_ntile,
    scalable_ntile_multi,
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


def test_bucketed_row_number_matches_serial(spark):
    rng = random.Random(274)
    rows = [
        Row(k=rng.randint(-200, 200), tb=i) for i in range(777)
    ]
    df = spark.createDataFrame(rows)
    got = (
        bucketed_row_number(
            df, "k", [F.col("k"), F.col("tb")], "rn", n_buckets=16
        )
        .orderBy("rn")
        .collect()
    )
    want = (
        df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "tb"))
        )
        .orderBy("rn")
        .collect()
    )
    assert [(r.k, r.tb, r.rn) for r in got] == [
        (r.k, r.tb, r.rn) for r in want
    ]


def test_bucketed_row_number_partitioned_matches_serial(spark):
    # part_cols path (the qs24 per-status shape): ranks restart per
    # group and must match the serial partitioned window exactly.
    rng = random.Random(279)
    rows = [
        Row(g=f"s{i % 3}", k=rng.randint(-500, 500), tb=i)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        map(
            tuple,
            bucketed_row_number(
                df,
                "k",
                [F.col("k"), F.col("tb")],
                "rn",
                part_cols=("g",),
                n_buckets=16,
            )
            .select("g", "k", "tb", "rn")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            df.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("g").orderBy("k", "tb")
                ),
            )
            .select("g", "k", "tb", "rn")
            .collect(),
        )
    )
    assert got == want


def test_bucketed_row_number_desc_via_negated_key(spark):
    rng = random.Random(275)
    rows = [Row(k=rng.randint(0, 99), tb=i) for i in range(300)]
    df = spark.createDataFrame(rows).withColumn(
        "neg", -F.col("k")
    )
    got = (
        bucketed_row_number(
            df,
            "neg",
            [F.col("k").desc(), F.col("tb")],
            "rn",
            n_buckets=8,
        )
        .orderBy("rn")
        .collect()
    )
    want = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("k").desc(), "tb")
            ),
        )
        .orderBy("rn")
        .collect()
    )
    assert [(r.k, r.tb, r.rn) for r in got] == [
        (r.k, r.tb, r.rn) for r in want
    ]


@pytest.mark.parametrize("n_rows", [3, 5, 23, 100])
def test_ntile_from_rank_matches_spark_ntile(spark, n_rows):
    rows = [Row(k=i) for i in range(n_rows)]
    df = spark.createDataFrame(rows)
    w = Window.orderBy("k")
    serial = df.select(
        "k", F.ntile(5).over(w).cast("long").alias("t")
    )
    mine = (
        df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .withColumn("total", F.lit(n_rows).cast("long"))
        .select(
            "k",
            ntile_from_rank("rank", "total", 5)
            .cast("long")
            .alias("t"),
        )
    )
    assert sorted(map(tuple, serial.collect())) == sorted(
        map(tuple, mine.collect())
    )


@pytest.mark.parametrize(
    "n,n_rows,dup", [(5, 100, 1), (5, 23, 7), (4, 3, 1), (3, 1000, 50), (7, 64, 64)]
)
def test_scalable_ntile_matches_spark_ntile(spark, n, n_rows, dup):
    # dup controls tie density: metric = i DIV dup, so dup rows share
    # each metric value and the tiebreak decides their tiles.
    rows = [Row(m=i // dup, tb=i * 13 % n_rows) for i in range(n_rows)]
    df = spark.createDataFrame(rows)
    w = Window.orderBy("m", "tb")
    want = sorted(
        (r.m, r.tb, r.t)
        for r in df.select(
            "m", "tb", F.ntile(n).over(w).cast("long").alias("t")
        ).collect()
    )
    got = sorted(
        (r.m, r.tb, r.t)
        for r in scalable_ntile(df, "m", "tb", "t", n, n_buckets=8)
        .collect()
    )
    assert got == want


def test_scalable_ntile_multi_matches_three_windows(spark):
    rng = random.Random(276)
    rows = [
        Row(
            cust=i,
            a=rng.randint(0, 40),
            b=rng.randint(-1000, 1000),
            c=rng.randint(0, 3),
        )
        for i in range(800)
    ]
    df = spark.createDataFrame(rows)
    want = sorted(
        map(
            tuple,
            df.select(
                "cust",
                F.ntile(5)
                .over(Window.orderBy("a", "cust"))
                .cast("long")
                .alias("ta"),
                F.ntile(5)
                .over(Window.orderBy("b", "cust"))
                .cast("long")
                .alias("tb_"),
                F.ntile(5)
                .over(Window.orderBy("c", "cust"))
                .cast("long")
                .alias("tc"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            scalable_ntile_multi(
                df,
                [("a", "ta"), ("b", "tb_"), ("c", "tc")],
                "cust",
                5,
                n_buckets=16,
            )
            .select("cust", "ta", "tb_", "tc")
            .collect(),
        )
    )
    assert got == want


def test_scalable_ntile_n1_is_constant(spark):
    df = spark.createDataFrame([Row(m=i, tb=i) for i in range(7)])
    out = scalable_ntile(df, "m", "tb", "t", 1).collect()
    assert sorted(r.t for r in out) == [1] * 7


def test_prefix_sum_multi_weight_matches_serial(spark):
    rng = random.Random(277)
    rows = [
        Row(v=k, a=rng.randint(0, 5), b=rng.randint(0, 3))
        for k in rng.sample(range(0, 5000), 400)
    ]
    df = spark.createDataFrame(rows)
    got = (
        bucketed_prefix_sum(
            df, "v", ["a", "b"], ["ca", "cb"], n_buckets=16
        )
        .orderBy("v")
        .collect()
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("ca", F.sum("a").over(w))
        .withColumn("cb", F.sum("b").over(w))
        .orderBy("v")
        .collect()
    )
    assert [(r.v, r.ca, r.cb) for r in got] == [
        (r.v, r.ca, r.cb) for r in want
    ]


def test_scalable_ntile_multi_fewer_rows_than_tiles(spark):
    # N < n across several metrics: boundary ranks repeat and each
    # row must still land in its own tile, matching F.ntile.
    df = spark.createDataFrame(
        [Row(cust=i, a=i % 2, b=5 - i) for i in range(3)]
    )
    want = sorted(
        map(
            tuple,
            df.select(
                "cust",
                F.ntile(5)
                .over(Window.orderBy("a", "cust"))
                .cast("long")
                .alias("ta"),
                F.ntile(5)
                .over(Window.orderBy("b", "cust"))
                .cast("long")
                .alias("tb_"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            scalable_ntile_multi(
                df, [("a", "ta"), ("b", "tb_")], "cust", 5, n_buckets=4
            )
            .select("cust", "ta", "tb_")
            .collect(),
        )
    )
    assert got == want


def test_capped_row_number_matches_serial_window(spark):
    # Salted two-level top-k == plain per-group row_number <= k,
    # including groups with fewer than k rows and k > n_salts overlap.
    from cds_etl_spark.operators.prefix import capped_row_number

    rng = random.Random(278)
    rows = [
        Row(g=f"s{i % 4}", v=rng.randint(0, 10**9), i=i)
        for i in range(500)
    ] + [Row(g="tiny", v=7, i=9999)]
    df = spark.createDataFrame(rows)
    w = Window.partitionBy("g").orderBy("v", "i")
    want = sorted(
        map(
            tuple,
            df.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= 7)
            .select("g", "v", "i", "pos")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            capped_row_number(df, ["g"], ["v", "i"], 7, n_salts=8)
            .select("g", "v", "i", "pos")
            .collect(),
        )
    )
    assert got == want


def test_scalable_ntile_accepts_smallint_metric(spark):
    # simpleString() spells ShortType 'smallint' / ByteType 'tinyint';
    # the type gate must accept them (r8 ADVICE: python-style names in
    # _INTEGRAL_TYPES falsely rejected valid short/byte columns).
    df = spark.createDataFrame(
        [Row(cust=i, a=i % 7) for i in range(40)]
    ).select(
        F.col("cust").cast("smallint").alias("cust"),
        F.col("a").cast("tinyint").alias("a"),
    )
    want = sorted(
        map(
            tuple,
            df.select(
                "cust",
                F.ntile(4)
                .over(Window.orderBy("a", "cust"))
                .cast("long")
                .alias("ta"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            scalable_ntile_multi(df, [("a", "ta")], "cust", 4, n_buckets=4)
            .select("cust", "ta")
            .collect(),
        )
    )
    assert got == want


def test_scalable_ntile_rejects_non_integral_tiebreak(spark):
    df = spark.createDataFrame(
        [Row(v=i, k=f"id{i}") for i in range(10)]
    )
    with pytest.raises(TypeError, match="tiebreak columns must be integral"):
        scalable_ntile(df, "v", "k", "tile", 4)


def test_prefix_sum_span_overflow_raises(spark):
    # Negated keys near LONG_MIN against positives near LONG_MAX:
    # mx - mn exceeds int64 and the bounds pass must raise loudly
    # instead of wrapping into misaligned bucket ids.
    big = 9223372036854775807
    df = spark.createDataFrame(
        [Row(v=-big + 2, c=1), Row(v=big - 2, c=1)]
    )
    with pytest.raises(Exception, match="span exceeds int64"):
        bucketed_prefix_sum(df, "v", "c", "cum").collect()


def test_ntile_from_rank_remainder_branch_is_integral(spark):
    # The otherwise branch (ranks past the big tiles) must be pure
    # integer DIV — probe a shape where N mod n > 0 so both branches
    # fire, and check the result column's type is integral.
    df = (
        spark.range(1, 11)
        .withColumnRenamed("id", "r")
        .withColumn("n", F.lit(10).cast("long"))
    )
    out = df.select(ntile_from_rank("r", "n", 3).alias("t"))
    assert dict(out.dtypes)["t"] == "bigint"
    got = [r.t for r in out.orderBy("t").collect()]
    want = [
        r.t
        for r in spark.range(1, 11)
        .select(F.ntile(3).over(Window.orderBy("id")).alias("t"))
        .collect()
    ]
    assert sorted(got) == sorted(want)


def test_percent_rank_algebra_single_row_partition(spark):
    # pr = (rn-1)/(n-1) is 0/0 for a 1-row partition where
    # F.percent_rank() returns 0.0; the qs71/qs24 rewires guard it
    # with WHEN n > 1 (r9 ADVICE). Probe the guarded algebra against
    # the real window function on a frame that has a singleton group.
    df = spark.createDataFrame(
        [Row(g="a", v=3), Row(g="a", v=1), Row(g="b", v=5)]
    )
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r.g, r.v): r.pr
        for r in df.select(
            "g", "v", F.percent_rank().over(w).alias("pr")
        ).collect()
    }
    rn = df.withColumn("_rn", F.row_number().over(w))
    stats = df.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
    got = {
        (r.g, r.v): r.pr
        for r in rn.join(F.broadcast(stats), "g")
        .select(
            "g",
            "v",
            F.when(
                F.col("_n") > 1,
                (F.col("_rn") - 1).cast("double") / (F.col("_n") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pr"),
        )
        .collect()
    }
    assert got == want
    assert got[("b", 5)] == 0.0
