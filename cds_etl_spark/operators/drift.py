"""Distribution-drift monitoring: binned histograms + PSI.

The production-ML counterpart of qs159's batch PSI query: a standing
BASELINE histogram (the reference window, persisted as parquet) and a
per-batch comparison producing one PSI row per group — the monitor a
100 TB/day ingest alarms on before bad data reaches training.

Determinism contract (shared with qs159): bin edges divide by a
power-of-two width (exact IEEE scaling — floor cannot straddle
engines or runs), counts are exact integers, Laplace +1 smoothing
keeps empty bins finite, and the final ≤``n_bins``-term float sum is
rounded at 4 dp. Scale shape: binning is a scan-fused projection, the
histogram is one narrow groupBy, and PSI computes over
(groups × bins) rows — never corpus-sized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    width: float = 32.0,
    n_bins: int = 16,
) -> DataFrame:
    """(group, bin, c): fixed-width clamped bins, one narrow groupBy.
    ``width`` should stay a power of two (exact scaling)."""
    b = df.select(
        F.col(group_col).alias("grp"),
        F.least(
            F.greatest(
                F.floor(F.col(value_col) / width).cast("bigint"), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).alias("bin"),
    )
    return b.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("c"))


def psi(
    current: DataFrame, baseline: DataFrame, n_bins: int = 16
) -> DataFrame:
    """PSI per group between two ``bin_histogram`` outputs:
    Σ (p_cur − p_base)·ln(p_cur/p_base) with +1 smoothing. Returns
    (grp, n_current, n_baseline, psi). Bins occupied in neither input
    contribute nothing under either formulation; bins occupied in one
    are aligned by conditional aggregation over the union (the qs159
    plan shape — no outer join)."""
    u = current.select(
        "grp", "bin", F.col("c").alias("c1"), F.lit(0).alias("c2")
    ).unionByName(
        baseline.select(
            "grp", "bin", F.lit(0).alias("c1"), F.col("c").alias("c2")
        )
    )
    p = u.groupBy("grp", "bin").agg(
        F.sum("c1").alias("c1"), F.sum("c2").alias("c2")
    )
    from pyspark.sql import Window

    wg = Window.partitionBy("grp")
    p = p.withColumn("t1", F.sum("c1").over(wg)).withColumn(
        "t2", F.sum("c2").over(wg)
    )
    p1 = (F.col("c1") + 1.0) / (F.col("t1") + float(n_bins))
    p2 = (F.col("c2") + 1.0) / (F.col("t2") + float(n_bins))
    return (
        p.groupBy("grp")
        .agg(
            F.max("t1").cast("bigint").alias("n_current"),
            F.max("t2").cast("bigint").alias("n_baseline"),
            F.round(F.sum((p1 - p2) * F.log(p1 / p2)), 4).alias("psi"),
        )
    )


def build_drift_baseline(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    group_col: str = "event_type",
    width: float = 32.0,
    n_bins: int = 16,
) -> None:
    """Persist the reference-window histogram. The baseline is the
    monitor's only state: (groups × bins) parquet rows, rebuilt
    deliberately (a new reference window is a policy decision, never
    an implicit rolling update that would mask slow drift)."""
    bin_histogram(df, value_col, group_col, width, n_bins).write.mode(
        "overwrite"
    ).parquet(path)


def build_anomaly_baseline(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    group_col: str = "event_type",
) -> None:
    """Persist per-group reference moments (grp, n, mu, sigma) for
    z-score anomaly flagging — the POINT-anomaly sibling of the PSI
    baseline: PSI asks "did the distribution move", this asks "is this
    individual row wild against the reference". Same state policy:
    the baseline is groups-sized parquet, rebuilt deliberately, never
    rolled forward implicitly (a self-updating reference learns to
    love its own anomalies). Uses Spark's numerically stable
    avg/stddev_samp — the reference window can be petabyte-scale, so
    the exact-integer algebra of qs167 (bounded there by its 20-row
    frame) would overflow; moment floats wobble only at the last ulp,
    harmless at z-threshold scale."""
    stats = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(value_col).alias("mu"),
        F.stddev_samp(value_col).alias("sigma"),
    )
    stats.write.mode("overwrite").parquet(path)


def zscore_anomalies(
    batch: DataFrame,
    baseline: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    z: float = 3.0,
) -> DataFrame:
    """Flag rows whose value deviates more than ``z`` reference
    standard deviations from their group's baseline mean. The
    baseline is groups-sized, so the join BROADCASTS — the batch
    never shuffles; output is the flagged rows with a ``zscore``
    column. Degenerate groups (sigma = 0 or NULL, n < 2) and groups
    absent from the baseline flag nothing (inner join + sigma guard):
    an unknown group is a schema event, not a point anomaly."""
    j = batch.join(
        F.broadcast(baseline),
        batch[group_col] == baseline["grp"],
        "inner",
    )
    score = (F.col(value_col) - F.col("mu")) / F.col("sigma")
    return (
        j.filter(
            F.col("sigma").isNotNull()
            & (F.col("sigma") > 0)
            & (F.abs(F.col(value_col) - F.col("mu")) > F.lit(z) * F.col("sigma"))
        )
        .select(*batch.columns, F.round(score, 2).alias("zscore"))
    )
