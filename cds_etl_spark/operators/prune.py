"""Structural pruning operators (O8/O17/O20/O21).

* `remove_nodes` — drop configured node tables from the output set
  (reference `remove_node`, cds_transformation_functions.py:162-169).
* `drop_columns` — drop named columns (cds-transformation.py:141).
* `string_canonical_dedup` — full-row distinct on the stringified row
  (reference dedups a fully `astype(str)` copy then re-selects rows,
  cds-transformation_v1.3.py:148-152 — a 2× materialization; here a
  single dropDuplicates over the stringified projection computed
  inline, no copy).
* `drop_all_null_prop_rows` — drop rows whose ORIGINAL model
  properties (excluding the id) are all null
  (cds-transformation_v1.3.py:153-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cds_etl_spark.model import Model
from cds_etl_spark.operators.projection import ROW_ID

NodeTables = dict[str, DataFrame]

INTERNAL_COLS = (ROW_ID,)


def remove_nodes(tables: NodeTables, nodes: list[str]) -> NodeTables:
    return {k: v for k, v in tables.items() if k not in set(nodes)}


def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    return df.drop(*[c for c in columns if c in df.columns])


def drop_internal(df: DataFrame) -> DataFrame:
    return df.drop(*[c for c in INTERNAL_COLS if c in df.columns])


def string_canonical_dedup(df: DataFrame) -> DataFrame:
    """Distinct over the string-canonical row (internal cols excluded
    from the key and dropped — identity columns would defeat dedup)."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLS]
    key = F.to_json(F.struct(*[F.col(f"`{c}`").cast("string").alias(c) for c in data_cols]))
    return (
        df.select(*[F.col(f"`{c}`") for c in data_cols], key.alias("_sk"))
        .dropDuplicates(["_sk"])
        .drop("_sk")
    )


def drop_all_null_prop_rows(df: DataFrame, model: Model, node: str, id_field: str) -> DataFrame:
    """Keep rows having at least one non-null ORIGINAL property other
    than the node id (parent FK columns and `type` don't count)."""
    props = [
        c for c in df.columns if c in set(model.nodes.get(node, [])) and c != id_field
    ]
    if not props:
        return df
    cond = None
    for c in props:
        term = F.col(f"`{c}`").isNotNull()
        cond = term if cond is None else (cond | term)
    return df.filter(cond)
