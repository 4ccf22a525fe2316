"""Funnel / conversion analysis — ordered multi-step event matching
per user.

The product-analytics staple: of the users who did step 1, how many
went on to do step 2 within the horizon, then step 3, …? Each step
must happen STRICTLY AFTER the user's (earliest) previous step — a
sequential pattern the relational form expresses as a chain of
conditional min-aggregations, one per step.

Scale shape: step k is one filter (pushed to the scan for literal
predicates) + one groupBy(user) min + one key join against step k-1's
timestamps — all shuffles on the (high-cardinality) user key, k small
and fixed. No per-user event sorting, no collect_list of event
histories (the naive formulation materializes every user's timeline;
this one only ever carries one timestamp per user per step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, Column]],
    horizon: str | None = None,
) -> DataFrame:
    """Match ``steps`` (ordered (name, predicate) pairs) per user.

    Returns one row per user who completed step 1:
    ``(user, t_<step1>, t_<step2>, …, depth)`` where ``t_<name>`` is
    the earliest timestamp of that step occurring after the previous
    step's match (NULL once the chain breaks) and ``depth`` counts
    completed steps. With ``horizon`` (e.g. ``"7 days"``), every
    subsequent step must land within that interval of the PREVIOUS
    step's match."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    name0, pred0 = steps[0]
    out = (
        events.filter(pred0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{name0}"))
    )
    prev = f"t_{name0}"
    for name, pred in steps[1:]:
        cur = f"t_{name}"
        bounded = F.col(ts_col) > F.col("__prev")
        if horizon:
            bounded = bounded & (
                F.col(ts_col) <= F.col("__prev") + F.expr(f"INTERVAL {horizon}")
            )
        nxt = (
            events.filter(pred)
            .join(out.select(user_col, F.col(prev).alias("__prev")), user_col)
            .filter(bounded)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(cur))
        )
        out = out.join(nxt, user_col, "left")
        prev = cur
    depth = sum(
        (F.col(f"t_{n}").isNotNull().cast("int") for n, _ in steps),
        F.lit(0),
    )
    return out.withColumn("depth", depth)
