"""One-pass column profiling — per-column null/distinct statistics in
long form.

The reference emits validation reports as its test surface
(SURVEY.md §5.1; property/ID reports in cds-transformation_v1.3.py:
105-108,170-182). This operator is the general form: a data-quality
profile of any table, computed in ONE aggregation job rather than one
query per column.

Scale shape: all per-column aggregates live in a single ``agg`` —
multiple exact COUNT(DISTINCT) in one aggregation plan through
Spark's Expand (each input row fans out once per distinct-column;
one scan, one shuffle keyed by the expand id). The wide single-row
result is then exploded to long form row-locally. Profiling a 100 TB
table is exactly one pass; the per-column-query formulation would be
N passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols``: returns ``(col_name, n_rows, n_null,
    n_distinct)`` with one row per column, computed in a single
    aggregation pass. ``n_distinct`` is exact and excludes NULLs
    (COUNT DISTINCT semantics in both Spark and ANSI SQL)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        wide.select("n_rows", F.explode(entries).alias("e"))
        .select("e.col_name", "n_rows", "e.n_null", "e.n_distinct")
    )
