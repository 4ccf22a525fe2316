"""Incremental aggregate maintenance — merge a delta batch's partial
aggregates into an aggregate state table.

The materialized-view primitive: a 100 TB fact table's per-key
aggregate is never recomputed from scratch; each arriving batch is
aggregated alone (small) and MERGED into the running state with
algebraic combine rules. Only works for decomposable aggregates —
count/sum/min/max combine directly, avg must be carried as (sum,
count) and finalized at read. That decomposition is exactly what
Spark's own partial/final hash aggregation does inside one query;
this operator applies it ACROSS queries/batches.

Batch analogue of streaming/ops.running_totals_stateful (same
semantics, state in a table instead of the streaming state store), and
the scalable generalization of the reference's historical-value
accumulation (cds_transformation_functions.py:420-445).

Scale shape: one aggregation of the delta (proportional to the batch)
plus one key-partitioned full-outer join against state (proportional
to touched state, with storage layouts like sources/bucketed.py
making it shuffle-free on the state side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# combine rule per aggregate kind: how two partial values merge
_COMBINE = {
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "sum": lambda a, b: (
        F.when(a.isNull() & b.isNull(), F.lit(None))
        .otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
    ),
    "min": lambda a, b: F.least(a, b),  # least/greatest skip NULLs
    "max": lambda a, b: F.greatest(a, b),
}


def aggregate_delta(
    delta: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one batch into partial-aggregate form. ``spec`` maps
    output column → (kind, source_col) with kind in count/sum/min/max
    (count ignores its source column)."""
    aggs = []
    for out, (kind, src) in spec.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind == "min":
            aggs.append(F.min(src).alias(out))
        elif kind == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate kind: {kind}")
    return delta.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge a delta's partial aggregates into ``state`` (same
    schema): full-outer join on the keys, algebraic combine per
    column. Keys present in only one side pass through; the result is
    the exact aggregate of (state's inputs ∪ delta's inputs)."""
    s = state.alias("s")
    d = delta_agg.alias("d")
    merged = s.join(d, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    for out, (kind, _) in spec.items():
        rule = _COMBINE[kind]
        cols.append(rule(F.col(f"s.{out}"), F.col(f"d.{out}")).alias(out))
    return merged.select(*cols)


def _join_mult(
    a: DataFrame, b: DataFrame, on: list[str], mult: str
) -> DataFrame:
    aa = a.withColumnRenamed(mult, "_ma")
    bb = b.withColumnRenamed(mult, "_mb")
    return (
        aa.join(bb, on)
        .withColumn(mult, F.col("_ma") * F.col("_mb"))
        .drop("_ma", "_mb")
    )


def join_delta(
    r_old: DataFrame,
    s_old: DataFrame,
    dr: DataFrame,
    ds: DataFrame,
    on: list[str],
    mult: str = "_mult",
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join, bag
    algebra (the DBToaster/differential-dataflow delta rule):
    Δ(R ⋈ S) = ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS, with every table carrying a
    row MULTIPLICITY column — an insert is +1, a delete is −1, and
    join multiplicities multiply, so deletions retract exactly the
    join rows they produced. ``apply_delta`` consolidates.

    Completes the IVM story next to ``aggregate_delta`` (which
    maintains aggregates): together a 100 TB materialized join-agg
    view updates in time proportional to the BATCH, not the view —
    the two delta joins touch only the delta's keys (bucketed state
    layouts make the big side shuffle-free), and the ΔR⋈ΔS term is
    delta-sized on both sides."""
    return (
        _join_mult(dr, s_old, on, mult)
        .unionByName(_join_mult(r_old, ds, on, mult))
        .unionByName(_join_mult(dr, ds, on, mult))
    )


def apply_delta(
    state: DataFrame, delta: DataFrame, mult: str = "_mult"
) -> DataFrame:
    """Consolidate a state table with a delta: union, sum
    multiplicities per distinct row, drop zeros (a fully retracted
    row vanishes — the invariant that keeps state from growing with
    churn)."""
    cols = [c for c in state.columns if c != mult]
    return (
        state.unionByName(delta.select(*state.columns))
        .groupBy(*cols)
        .agg(F.sum(mult).alias(mult))
        .filter(F.col(mult) != 0)
    )
