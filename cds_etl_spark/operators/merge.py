"""Grouped row-merge — the reference's `combine_rows` (O18).

Reference (cds_transformation_functions.py:125-160): for each
configured node, collapse all rows sharing an id to ONE row; per
column take the distinct non-null values, sort them, and if more than
one remains join their stripped string forms with ', ' — skipping a
value when it already occurs as a substring of the accumulated string
(:145). The reference runs this as an O(#ids × rows × cols)
nested-loop of boolean-mask scans (measured ~16× slower than a hash
aggregation at just 15k rows, BASELINE.md).

Spark re-expression: ONE hash aggregation —
    groupBy(id).agg(array_sort(collect_set(col)) ...)
followed by a higher-order `aggregate` fold that reproduces the
', '-join-with-substring-skip exactly, all inside codegen. Partial
(map-side) aggregation makes this shuffle only distinct values per
group; at 100 TB this is the canonical scalable formulation.

Sorting happens on the column's ORIGINAL type (numeric sort for
numerics, lexicographic for strings — same as Python's sort of typed
values), then values are stringified like the reference's `str(v)`.
Output columns are strings (the reference's object columns serialize
identically to TSV).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NodeTables = dict[str, DataFrame]


def _stringify(dtype: str, c: Column) -> Column:
    # str(v).strip() — trailing '.0' is kept for floats (str(1.0) == '1.0')
    return F.trim(c.cast("string"))


def _merged_column(df: DataFrame, col: str) -> Column:
    dtype = dict(df.dtypes)[col]
    vals = F.array_sort(F.collect_set(F.col(f"`{col}`")))  # distinct, non-null, sorted
    strs = F.transform(vals, lambda v: _stringify(dtype, v))
    joined = F.aggregate(
        strs,
        F.lit(""),
        lambda acc, x: F.when(acc == "", x).otherwise(
            F.when(~acc.contains(x), F.concat(acc, F.lit(", "), x)).otherwise(acc)
        ),
    )
    # 0 values → NULL; ≥1 → folded string (single value == its str form)
    return F.when(F.size(vals) == 0, F.lit(None)).otherwise(joined).alias(col)


def combine_rows_node(df: DataFrame, id_column: str) -> DataFrame:
    """Collapse `df` to one row per `id_column` value."""
    if id_column not in df.columns:
        return df
    aggs = [_merged_column(df, c) for c in df.columns if c != id_column]
    out = df.groupBy(id_column).agg(*aggs)
    # The id column itself is part of the reference's per-column loop;
    # its merged form equals the group key, so emit key as string for
    # column-type consistency with the other merged columns.
    return out.select(
        *[
            F.trim(F.col(f"`{c}`").cast("string")).alias(c) if c == id_column else F.col(f"`{c}`")
            for c in out.columns
        ]
    )


def combine_rows(tables: NodeTables, combine_config: list[dict]) -> NodeTables:
    """Apply COMBINE_NODE rules ({node, id_column};
    cds_config_example_v1.3.yaml:64-73) to the table dict."""
    out = dict(tables)
    for rule in combine_config:
        node = rule["node"]
        if node in out:
            out[node] = combine_rows_node(out[node], rule["id_column"])
    return out
