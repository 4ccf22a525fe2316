"""Derived-key operators (O9/O10/O11).

Reference semantics re-expressed as vectorized expressions / joins:

* `combine_columns` (cds_transformation_functions.py:362-393): build
  `new = canon(col1) || '_' || canon(col2)` rowwise, only when both are
  non-null; floats that are integral render without the trailing `.0`
  (`convert_to_string` :395-400). The reference does this with a Python
  loop of `.loc[i, c]` scalar reads/writes — O(rows) interpreter-bound;
  here it is one `concat_ws` expression inside codegen. The
  `external_node` variant aligns the other table's column BY ROW
  POSITION (:384-388) → re-expressed as an equi-join on the ingest
  `_row_id` (see projection.with_row_id).

* `add_secondary_id` (:402-418): if a node's id column is missing,
  copy the parent's id column row-by-row (positional) → `_row_id` join.

* `synthetic_file_id` (v1.2 `extract_data`,
  cds-transformation_v1.2.py:66-73): missing file_id filled from a GUID
  column when present, else generated. The reference draws *random*
  10-digit ints; at scale a deterministic content hash is strictly
  better (idempotent re-runs, no collisions across batches), so the
  default derives xxhash64 of the natural-key columns; a
  monotonically-increasing variant is kept for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cds_etl_spark.operators.projection import ROW_ID

NodeTables = dict[str, DataFrame]


def canonical_string(df: DataFrame, col: str) -> Column:
    """Reference `convert_to_string`: integral floats lose the '.0'."""
    c = F.col(f"`{col}`")
    dtype = dict(df.dtypes).get(col)
    if dtype in ("double", "float"):
        return F.when(c == F.floor(c), c.cast("long").cast("string")).otherwise(
            c.cast("string")
        )
    return c.cast("string")


def combine_columns(tables: NodeTables, combine_config: list[dict]) -> NodeTables:
    """Apply every COMBINE_COLUMN rule (config shape mirrors
    cds_config_example_v1.3.yaml:75-99: node, column1, column2,
    new_column, external_node)."""
    out = dict(tables)
    for rule in combine_config:
        node = rule["node"]
        if node not in out:
            continue
        df = out[node]
        c1, c2, new = rule["column1"], rule["column2"], rule["new_column"]
        external = rule.get("external_node") or False
        if not external:
            if c1 not in df.columns or c2 not in df.columns:
                continue
            value = F.when(
                F.col(f"`{c1}`").isNotNull() & F.col(f"`{c2}`").isNotNull(),
                F.concat_ws("_", canonical_string(df, c1), canonical_string(df, c2)),
            )
            out[node] = df.withColumn(new, value)
        else:
            ext = out.get(external)
            if ext is None or c1 not in ext.columns or c2 not in df.columns:
                continue
            if ROW_ID not in df.columns or ROW_ID not in ext.columns:
                raise ValueError(
                    "external_node combine requires _row_id alignment (ingest via with_row_id)"
                )
            side = ext.select(
                F.col(ROW_ID), canonical_string(ext, c1).alias("_ext_val")
            )
            joined = df.join(side, ROW_ID, "left")
            value = F.when(
                F.col("_ext_val").isNotNull() & F.col(f"`{c2}`").isNotNull(),
                F.concat_ws("_", F.col("_ext_val"), canonical_string(df, c2)),
            )
            out[node] = joined.withColumn(new, value).drop("_ext_val")
    return out


def add_secondary_id(tables: NodeTables, secondary_config: list[dict]) -> NodeTables:
    """SECONDARY_ID_COLUMN rules (cds_config_example_v1.3.yaml:101-113):
    when `node_id` is absent from the node, fill it from
    `secondary_id` = "parent_node.parent_prop", aligned on `_row_id`."""
    out = dict(tables)
    for rule in secondary_config:
        node = rule["node"]
        if node not in out:
            continue
        df = out[node]
        if rule["node_id"] in df.columns:
            continue
        parent_node, parent_prop = rule["secondary_id"].split(".", 1)
        parent = out.get(parent_node)
        if parent is None or parent_prop not in parent.columns:
            continue
        if ROW_ID not in df.columns or ROW_ID not in parent.columns:
            raise ValueError(
                "add_secondary_id requires _row_id alignment (ingest via with_row_id)"
            )
        side = parent.select(F.col(ROW_ID), F.col(parent_prop).alias(rule["node_id"]))
        out[node] = df.join(side, ROW_ID, "left")
    return out


def synthetic_file_id(
    df: DataFrame,
    id_col: str = "file_id",
    guid_col: str | None = "GUID",
    natural_key_cols: list[str] | None = None,
) -> DataFrame:
    """Fill a missing/null id column: prefer the GUID column, else a
    deterministic 10-digit id from xxhash64 over the natural key (all
    columns if unspecified). Deterministic beats the reference's
    `random.sample` at scale: idempotent and executor-parallel."""
    cols = natural_key_cols or [c for c in df.columns if c not in (id_col, ROW_ID)]
    hashed = (F.pmod(F.xxhash64(*[F.col(f"`{c}`") for c in cols]), F.lit(9 * 10**9)) + 10**9).cast(
        "string"
    )
    source = F.col(f"`{guid_col}`") if guid_col and guid_col in df.columns else F.lit(None)
    existing = F.col(f"`{id_col}`") if id_col in df.columns else F.lit(None)
    return df.withColumn(id_col, F.coalesce(existing, source, hashed))
