"""Time-series operators — forward-fill imputation and regular-grid
resampling (gap filling).

The reference's closest op is the null-default fill in clean_data
(cds_transformation_functions.py:43-44), a constant fill. These are
the time-aware forms every metrics/telemetry pipeline needs:

- ``forward_fill``: carry the last observed non-null value forward
  within a key's timeline (LAST_VALUE IGNORE NULLS).
- ``resample``: aggregate events onto a regular time grid per key,
  materializing empty buckets — the densify step before windowed
  models or charting.

Scale shape: both are one shuffle on the series key. Forward fill is
a running window (state = one value per column per key, streamed in
order by the window sort). Resample's grid is generated ROW-LOCALLY
per key with sequence()+explode from that key's min/max bucket — no
driver-side calendar, no cross join against a global grid (a global
grid × keys product is the classic blowup; per-key bounds keep output
proportional to actual span).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    ts_col: str,
    cols: list[str],
    partition_cols: list[str],
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Replace NULLs in ``cols`` with the last preceding non-null
    value within each key's timeline. ``order_extra`` breaks ordering
    ties (pass a unique id for deterministic fill under equal
    timestamps). Leading NULLs (no prior observation) stay NULL."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(ts_col, *(order_extra or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Aggregate onto a regular ``step`` grid per key, densifying
    empty buckets: returns ``(key, bucket, n, total)`` for every grid
    point between the key's first and last event, with ``n = 0`` and
    NULL ``total`` where nothing happened. Buckets are aligned to
    ``F.window(ts, step)`` boundaries (epoch-anchored, same alignment
    as the streaming windows in streaming/ops.py)."""
    bucket = F.window(ts_col, step).start
    agg = (
        df.select(F.col(key_col), bucket.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total"))
    )
    grid = (
        df.select(F.col(key_col), bucket.alias("b"))
        .groupBy(key_col)
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    return (
        grid.join(agg, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "total",
        )
    )
