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
    # ASC NULLS FIRST pinned explicitly: an event with a missing
    # timestamp sequences before the epoch (and starts the session
    # numbering) — engine defaults diverge on null position (r15
    # NULL axis; the SQL twin must state NULLS FIRST).
    order = [F.col(ts_col).asc_nulls_first()] + (
        [F.col(tiebreak)] if tiebreak else []
    )
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


def sessionize_sharded(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    session_col: str = "session_id",
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """``sessionize`` with the per-user task cliff removed — identical
    output, different plan.

    ``sessionize`` puts EVERY event of a user into one window task;
    the r11 Zipf skew audit recorded that as the one honest scale
    ceiling (a 1%-hot user at 1000x is ~170M rows in a single task).
    This variant shards each user's stream into ``chunk_seconds``
    time chunks and stitches the boundaries:

    1. lag/start flags are computed INSIDE each (user, chunk) shard —
       parallelism = users x chunks, so a hot user's year splits into
       ~365 tasks instead of one;
    2. a per-shard summary (one row per non-empty shard: first/last
       event epoch, local start count) decides each shard's
       first-event start flag from the PREVIOUS non-empty shard's
       last timestamp, and prefix-sums shard start counts into a
       numbering offset — a per-user window over shard summaries,
       thousands of times smaller than the event stream (the same
       bounded-boundary trick as the qs82/qs167 rolling epilogues);
    3. the offset joins back on (user, chunk) — the exact
       partitioning step 1 produced, so no extra event-scale
       exchange kind beyond the one ``sessionize`` already pays.

    Equal timestamps always share a chunk (the chunk key is a pure
    function of the timestamp), so ``tiebreak`` ordering never spans
    a shard boundary and gap-spanning-multiple-empty-chunks stitches
    through the previous NON-EMPTY shard. Serial-equality is pinned
    by tests/test_session_sharded.py at two SFs plus adversarial
    boundary fixtures."""
    order_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    c, ls, rn, off, fis = (
        "__ss_chunk", "__ss_ls", "__ss_rn", "__ss_off", "__ss_fis"
    )
    dfc = df.withColumn(c, F.floor(ts_s / F.lit(float(chunk_seconds))))
    ws = Window.partitionBy(user_col, c).orderBy(
        *[F.col(x) for x in order_cols]
    )
    prev = F.lag(ts_s).over(ws)
    dfl = dfc.withColumn(
        ls,
        F.when(
            prev.isNull() | ((ts_s - prev) > F.lit(float(gap_seconds))), 1
        ).otherwise(0),
    ).withColumn(rn, F.row_number().over(ws))

    summ = dfl.groupBy(user_col, c).agg(
        F.min(ts_s).alias("__ss_first"),
        F.max(ts_s).alias("__ss_last"),
        # starts strictly after the shard's first event — the first
        # event's flag is decided at stitch time below
        F.sum(F.when(F.col(rn) > 1, F.col(ls)).otherwise(0)).alias(
            "__ss_rest"
        ),
    )
    wu = Window.partitionBy(user_col).orderBy(c)
    prev_last = F.lag("__ss_last").over(wu)
    summ = summ.withColumn(
        fis,
        F.when(
            prev_last.isNull()
            | ((F.col("__ss_first") - prev_last) > F.lit(float(gap_seconds))),
            1,
        ).otherwise(0),
    )
    summ = summ.withColumn(
        off,
        F.coalesce(
            F.sum(F.col("__ss_rest") + F.col(fis)).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(user_col, c, off, fis)

    joined = dfl.join(summ, [user_col, c])
    is_start = F.when(F.col(rn) == 1, F.col(fis)).otherwise(F.col(ls))
    idx = F.col(off) + F.sum(is_start).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        session_col,
        F.concat_ws("-", F.col(user_col).cast("string"), idx.cast("string")),
    ).drop(c, ls, rn, off, fis)
