"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key.

The reference has nothing like it (its joins are exact-key lookups);
this is the §2.3 "as-of family" capability, needed by any event/feature
pipeline ("value of X as of event time").

Scale design — the union+window formulation, NOT a range join:
a naive `l JOIN r ON key AND r.ts <= l.ts` explodes to every
(left, earlier-right) pair before the max-per-left collapse — O(n·m)
per key. Instead, union both sides (tagged), sort within key by
(ts, side) once, and carry the right row's payload forward with
`last(..., ignorenulls=True)`. One shuffle on the key, O(n+m) rows
total, per-key skew handled by AQE like any other window. This is the
same plan shape Flink/kdb use for as-of, expressed in two built-in
Spark operators (union + window) — no UDF, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row gains `payload` columns from
    the latest `right` row with `right[right_ts] <= left[left_ts]` and
    the same key (`on` on the left, `right_on` — default `on` — on the
    right; null payload when no such row).

    Equal timestamps match (right sorts before left at the same ts).
    Among right rows tied on (key, ts), the one with the greatest
    `tiebreak` wins — pass a unique right key for deterministic output.

    NULL-timestamp semantics (r15 NULL axis): a right row with a NULL
    `right_ts` never matches anything (it is dropped before the
    union — without this it would sort NULLS FIRST and act as a
    match-everything row at -infinity), and a left row with a NULL
    `left_ts` gets NULL payload (it sorts before every real right
    row). This matches the SQL correlated-subquery formulation, where
    `right_ts <= NULL` and `NULL <= left_ts` are never true.
    """
    lcols = left.columns
    tb_col = tiebreak if (tiebreak is None or tiebreak in payload) else "_tb"
    r_order = [F.col("_ts").asc(), F.col("_side").asc()] + (
        # Ascending: among right ties on (key, ts) the greatest tiebreak
        # sorts last, and last-in-window wins below.
        [F.col(f"`{tb_col}`").asc_nulls_first()] if tiebreak else []
    )
    rsel = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(right_on or on).alias("_k"),
        F.col(right_ts).cast("timestamp_ntz").alias("_ts"),
        F.lit(0).alias("_side"),  # right first at equal ts → inclusive <=
        *[F.col(c) for c in payload],
        *([F.col(tiebreak).alias("_tb")] if tiebreak and tiebreak not in payload else []),
    )
    lsel = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp_ntz").alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rsel.schema[c].dataType).alias(c) for c in payload],
        *([F.lit(None).cast(rsel.schema["_tb"].dataType).alias("_tb")]
          if tiebreak and tiebreak not in payload else []),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    rsel = rsel.select(
        "*", *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols]
    )
    u = rsel.unionByName(lsel)
    w = (
        Window.partitionBy("_k")
        .orderBy(*r_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in payload]
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_asof_{c}").alias(c) for c in payload],
    )
