"""Slowly-changing-dimension (type 2) maintenance — versioned upsert
of a dimension table from an update batch.

The reference's closest surface is the historical-value accumulation
(operators/history.py, cds_transformation_functions.py:420-466), which
keeps an append-only value history per key. SCD2 is the general
warehouse form: every key carries dated versions
``(key, attrs..., valid_from, valid_to)`` with the live version's
``valid_to`` NULL; applying a batch closes changed versions and opens
new ones.

Scale design: the whole apply is key-partitioned joins and unions —
one shuffle on the dimension key (or none for the broadcast-sized
update batches typical of dimension feeds; Catalyst/AQE picks the
strategy from the batch size). No driver-side state, no window over
the full dimension: history rows pass through untouched, so the
operator's cost is proportional to the CURRENT slice plus the batch,
not the accumulated history.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_tracked_differs(tracked: list[str]) -> Column:
    diffs = [
        ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}")) for c in tracked
    ]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    eff_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; return the new state.

    ``dim`` holds all versions: ``(key, tracked..., start_col,
    end_col)`` with NULL ``end_col`` marking the live version.
    ``updates`` holds ``(key, tracked..., eff_col)`` — at most one row
    per key (enforce upstream; this operator does not arbitrate
    in-batch duplicates).

    Semantics per update row:
    - key exists and any tracked attribute differs (null-safely) from
      the live version → the live version is closed at ``eff_col``
      and a new live version opens at ``eff_col``;
    - key exists with identical attributes → no-op;
    - key with NO live version — brand new, or present only as closed
      history (deleted/expired) — → inserted as a live version
      (re-activation; its closed history passes through unchanged).
    History rows (non-NULL ``end_col``) always pass through unchanged.
    """
    out_cols = [key, *tracked, start_col, end_col]
    hist = dim.filter(F.col(end_col).isNotNull()).select(*out_cols)
    cur = dim.filter(F.col(end_col).isNull())

    changed = (
        cur.alias("cur")
        .join(updates.alias("upd"), key)
        .filter(_any_tracked_differs(tracked))
        .select(F.col(key), F.col(f"upd.{eff_col}").alias(eff_col))
    )
    closed = (
        cur.drop(end_col)
        .join(changed, key)
        .select(key, *tracked, start_col, F.col(eff_col).alias(end_col))
    )
    unchanged_cur = cur.join(changed.select(key), key, "left_anti").select(*out_cols)
    new_versions = (
        updates.join(changed.select(key), key)
        .select(
            key,
            *tracked,
            F.col(eff_col).alias(start_col),
            F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
        )
    )
    # Anti-join against the LIVE slice, not all dim keys: a key whose
    # only rows are closed history has no live version to diff against,
    # so its update must re-enter as an insert — anti-joining the full
    # dimension would silently drop it.
    inserts = (
        updates.join(cur.select(key), key, "left_anti")
        .select(
            key,
            *tracked,
            F.col(eff_col).alias(start_col),
            F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
        )
    )
    return hist.unionByName(unchanged_cur).unionByName(closed).unionByName(
        new_versions
    ).unionByName(inserts)
