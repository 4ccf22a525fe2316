"""Invariant tests for the finance/time-series queries qs199-qs203.

The differential suite (test_oracle_queries) already proves
Spark==DuckDB for these; here we assert the SEMANTIC invariants the
oracle equality alone cannot see (exact-cent conservation, interval
contiguity, grid density, funnel monotonicity).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.plans import QUERIES


def test_qs200_proration_conserves_cents(spark, sf_dir):
    """The whole point of largest-remainder: per-order allocations
    must sum EXACTLY to the header total — no lost or minted cent."""
    out = QUERIES["qs200_proration_cents"](spark, sf_dir)
    per_order = out.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("alloc")
    )
    hdr = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("t"),
        )
    )
    bad = per_order.join(hdr, "l_orderkey").filter(
        F.col("alloc") != F.col("t")
    )
    assert bad.count() == 0


def test_qs200_alloc_within_one_cent_of_proportional(spark, sf_dir):
    """Largest-remainder never moves any line more than one cent off
    its exact proportional share (floor ≤ alloc ≤ floor+1)."""
    out = QUERIES["qs200_proration_cents"](spark, sf_dir)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 97 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("w"),
        )
    )
    hdr = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("t"),
        )
    )
    from pyspark.sql import Window

    j = (
        li.join(hdr, "l_orderkey")
        .withColumn(
            "tw", F.sum("w").over(Window.partitionBy("l_orderkey"))
        )
        .withColumn("fl", F.expr("(t * w) div tw"))
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # lineitem (dup line numbers exist), so a row-level join would
    # cross-match; state the bound over the dup-key GROUP instead:
    # sum(fl) <= sum(alloc) <= sum(fl) + n_rows.
    fl_g = j.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("fl").alias("sfl"), F.count(F.lit(1)).alias("n")
    )
    al_g = out.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("alloc_cents").alias("sal")
    )
    chk = al_g.join(fl_g, ["l_orderkey", "l_linenumber"]).filter(
        (F.col("sal") < F.col("sfl"))
        | (F.col("sal") > F.col("sfl") + F.col("n"))
    )
    assert chk.count() == 0


def test_qs201_grid_is_dense_and_cum_monotone(spark, sf_dir):
    out = QUERIES["qs201_date_spine_fill"](spark, sf_dir).cache()
    try:
        assert out.count() == 182 * 20
        assert (
            out.select("d", "grp").distinct().count() == 182 * 20
        ), "grid has duplicate (day, grp) cells"
        from pyspark.sql import Window

        w = Window.partitionBy("grp").orderBy("d")
        dec = out.withColumn(
            "prev", F.lag("cum_cents").over(w)
        ).filter(
            F.col("prev").isNotNull()
            & (F.col("cum_cents") < F.col("prev"))
        )
        assert dec.count() == 0, "cumulative sum decreased"
    finally:
        out.unpersist()


def test_qs199_intervals_contiguous_no_repeat_status(spark, sf_dir):
    out = QUERIES["qs199_scd2_dimension"](spark, sf_dir).cache()
    try:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("version")
        nxt = out.select(
            "user_id",
            "version",
            "status",
            "eff_from",
            "eff_to",
            F.lead("eff_from").over(w).alias("next_from"),
            F.lead("status").over(w).alias("next_status"),
        )
        gaps = nxt.filter(
            F.col("next_from").isNotNull()
            & (F.col("eff_to") != F.col("next_from"))
        )
        assert gaps.count() == 0, "intervals not contiguous"
        rep = nxt.filter(
            F.col("next_status").isNotNull()
            & (F.col("status") == F.col("next_status"))
        )
        assert rep.count() == 0, "consecutive rows share a status"
        cur = out.filter(F.col("eff_to").isNull())
        users = out.select("user_id").distinct().count()
        assert cur.count() == users, "exactly one open row per user"
    finally:
        out.unpersist()


def test_qs203_funnel_counts_monotone(spark, sf_dir):
    rows = {
        r["step"]: r["users"]
        for r in QUERIES["qs203_funnel_conversion"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3] >= 0


def test_qs206_grid_blocking_has_full_recall(spark, sf_dir):
    """The 3x3 neighborhood is sufficient: radius (5 deg) == cell
    size, so every true pair falls in adjacent cells — the blocked
    join must equal the brute-force all-pairs join exactly."""
    out = QUERIES["qs206_grid_spatial_pairs"](spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer")
    pts = cu.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271) % 1800000 - 900000).alias(
            "lat"
        ),
        ((F.col("c_custkey") * 69621) % 3600000 - 1800000).alias(
            "lon"
        ),
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                (F.col("lat_a") - F.col("lat_b"))
                * (F.col("lat_a") - F.col("lat_b"))
                + (F.col("lon_a") - F.col("lon_b"))
                * (F.col("lon_a") - F.col("lon_b"))
            )
            .cast("long")
            .alias("d2"),
        )
        .filter(F.col("d2") <= 2500000000)
    )
    assert out.exceptAll(brute).count() == 0
    assert brute.exceptAll(out).count() == 0


def test_qs204_acf_bounded(spark, sf_dir):
    rows = QUERIES["qs204_autocorrelation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["acf1"] <= 1.0
        assert -1.0 <= r["acf2"] <= 1.0
