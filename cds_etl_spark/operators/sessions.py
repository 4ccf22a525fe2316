"""Batch sessionization: gap-based session ids over an event table.

The batch twin of streaming session windows (streaming/ops.py
session_window path): a session is a maximal run of a user's events
where consecutive gaps are ≤ ``gap_seconds``. Computed with the
standard two-window formulation — lag to flag session starts, running
sum to number them — one shuffle on the user key, no UDFs, no state.

At scale: the only exchange is hash-partitioning by ``user_col``
(exactly the partitioning a downstream per-session aggregate reuses,
so Catalyst elides the second shuffle), and per-user event counts are
bounded in practice, so the in-partition sort is cheap and skew-safe
relative to a global sort.

Reference parity: none (no temporal ops in cds-etl); this is part of
the events/training-pipeline extension surface (SURVEY.md §2.3
Streaming row; QS-43 exercises it against a DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Add a deterministic ``session_col`` = ``<user>-<n>`` (n = 1-based
    session index in time order).

    ``tiebreak`` orders equal timestamps (required for a deterministic
    numbering when timestamps can collide — pass the event id).
    Timestamps compare as epoch seconds with fractional precision
    (``cast(ts as double)`` = micros/1e6, the same arithmetic DuckDB's
    ``epoch(ts)`` does, so the boundary decision is engine-portable).
    NTZ timestamps route through an LTZ cast first (no-op under the
    engine's pinned-UTC session zone) — Spark refuses NTZ→double.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_s).over(w)
    is_start = F.when(
        prev.isNull() | ((ts_s - prev) > F.lit(float(gap_seconds))), 1
    ).otherwise(0)
    idx = F.sum(is_start).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col,
        F.concat_ws("-", F.col(user_col).cast("string"), idx.cast("string")),
    )
