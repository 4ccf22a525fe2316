"""Distributed prefix sums: ordered running totals WITHOUT the
single-task global window.

``Window.orderBy(...)`` with no partition moves every row to ONE
task — the classic scale cliff behind midrank tables (qs243/qs271),
Lorenz curves and any "cumulative X by sorted Y" epilogue: on a
1000-executor cluster the whole frame still sorts on one core. The
two-level formulation here keeps the running total EXACT while
spreading the sort:

1. rows bucket by integer value range (``(v - min) DIV width`` —
   order-aligned by construction, no sampling, no nondeterministic
   partition ids, AQE-proof);
2. an in-bucket cumulative window runs per (group, bucket) — one
   task per bucket, fully parallel;
3. bucket totals (≤ ``n_buckets`` rows per group) take their own
   tiny cumulative window, and each bucket's EXCLUSIVE running
   offset broadcast-joins back on (group, bucket).

Every quantity is an exact integer sum, so the result is
bit-identical to the serial window (equality-tested in
tests/test_prefix.py) — only the physical plan changes.

Reference parity: the reference sorts whole pandas frames in one
process (/root/reference/cds_transformation_functions.py — single-
node semantics); this module is how the same ordered-accumulation
semantics survive a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str,
    part_cols: tuple[str, ...] = (),
    n_buckets: int = 1024,
) -> DataFrame:
    """Inclusive running SUM(``weight_col``) ordered by
    ``order_col`` (ascending) within each ``part_cols`` group,
    returned as ``out_col`` — exact-integer equal to
    ``F.sum(weight).over(Window.partitionBy(*part_cols)
    .orderBy(order_col).rowsBetween(unboundedPreceding, 0))``
    but parallel over ``n_buckets`` range buckets per group.

    Requirements: ``order_col`` is an integral type (the bucket
    arithmetic is exact integer division) and UNIQUE within its
    group (the usual shape — callers run it over a distinct-value
    count table, where ties were already collapsed; with duplicate
    keys an inclusive running sum is ordering-ambiguous in the
    serial form too). ``weight_col`` must be integral for the
    exactness guarantee to hold.
    """
    pc = list(part_cols)
    gb = df.groupBy(*pc) if pc else df.groupBy()
    bounds = gb.agg(
        F.min(order_col).alias("_mn"),
        F.max(order_col).alias("_mx"),
    )
    b = (
        df.join(F.broadcast(bounds), pc)
        if pc
        else df.crossJoin(F.broadcast(bounds))
    )
    # width = range DIV n_buckets + 1: exact integer division (no
    # float rounding near the int64 edge, no (v-mn)*n_buckets
    # blowup), so bucket ids are order-aligned by construction.
    b = (
        b.withColumn(
            "_w",
            F.expr(f"(_mx - _mn) DIV {int(n_buckets)}") + F.lit(1),
        )
        .withColumn(
            "_bkt", F.expr(f"(`{order_col}` - _mn) DIV _w")
        )
        .drop("_mn", "_mx", "_w")
    )
    win_in = (
        Window.partitionBy(*pc, "_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = b.withColumn("_cum_in", F.sum(weight_col).over(win_in))
    btot = b.groupBy(*pc, "_bkt").agg(
        F.sum(weight_col).alias("_tot")
    )
    win_b = (
        Window.partitionBy(*pc)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boff = btot.select(
        *pc,
        "_bkt",
        (F.sum("_tot").over(win_b) - F.col("_tot")).alias("_off"),
    )
    out = (
        b.join(F.broadcast(boff), pc + ["_bkt"])
        .withColumn(out_col, F.col("_cum_in") + F.col("_off"))
        .drop("_bkt", "_cum_in", "_off")
    )
    return out


def midrank2(
    df: DataFrame,
    value_col: str,
    count_col: str,
    out_col: str,
    part_cols: tuple[str, ...] = (),
    n_buckets: int = 1024,
) -> DataFrame:
    """Doubled midranks (2·average-rank, always an exact integer)
    over a distinct-value count table: 2·cum − c + 1 where cum is
    the inclusive running count in value order. The shared epilogue
    of the rank-statistic family (Spearman qs243, Kruskal–Wallis
    qs271, Mann–Whitney) — scalable via :func:`bucketed_prefix_sum`
    instead of a single-task global window."""
    out = bucketed_prefix_sum(
        df,
        value_col,
        count_col,
        "_cum",
        part_cols=part_cols,
        n_buckets=n_buckets,
    )
    return out.withColumn(
        out_col, 2 * F.col("_cum") - F.col(count_col) + 1
    ).drop("_cum")
