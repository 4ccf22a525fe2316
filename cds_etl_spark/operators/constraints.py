"""Declarative constraint validation from the model YAML.

The model (SURVEY.md §1.2) declares three constraint kinds the
reference only encodes as metadata: enum domains (`Enum`), regex value
patterns (`md5sum` ^[0-9a-fA-F]{32}$, `phs_accession`
^phs[0-9]+([.]v[0-9]+)*$, … — cds-model-props.yml), and required
flags (`Req: true`). The reference enforces none of them directly
(enums surface via clean_data's rewrite, required via UI validation);
a warehouse engine must be able to CHECK them.

`check_constraints` compiles each node's applicable constraints into
ONE scan-fused projection (per-row violation array, `isin` /
`rlike` / `isNotNull` predicates — all codegen) and explodes only the
violations. Cost: one pass over the table, output proportional to
violations, not rows. No shuffles at all — report rows stay where the
data is until the caller aggregates/sinks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cds_etl_spark.model import Model

NodeTables = dict[str, DataFrame]

REPORT_COLS = ("node", "row_key", "property", "violation", "value")


def check_node_constraints(
    df: DataFrame, model: Model, node: str, key_col: str | None = None
) -> DataFrame:
    """Violation report for one node table: rows (node, row_key,
    property, violation ∈ {not_in_enum, pattern_mismatch,
    required_null}, offending value)."""
    checks = []  # (property, violation kind, predicate-over-column)
    for col in df.columns:
        p = model.prop(col)
        c = F.col(f"`{col}`")
        s = c.cast("string")
        if p.enum:
            checks.append((col, "not_in_enum", c.isNotNull() & ~s.isin(list(p.enum))))
        if p.pattern:
            checks.append(
                (col, "pattern_mismatch", c.isNotNull() & ~s.rlike(p.pattern))
            )
        if p.required:
            checks.append((col, "required_null", c.isNull() | (F.trim(s) == "")))
    key = F.col(f"`{key_col}`").cast("string") if key_col else F.lit(None).cast("string")
    if not checks:
        return df.sparkSession.createDataFrame(
            [], "node string, row_key string, property string, violation string, value string"
        )
    viols = F.array(
        *[
            F.when(
                pred,
                F.struct(
                    F.lit(col).alias("property"),
                    F.lit(kind).alias("violation"),
                    F.col(f"`{col}`").cast("string").alias("value"),
                ),
            )
            for col, kind, pred in checks
        ]
    )
    return (
        df.select(key.alias("row_key"), F.explode(F.filter(viols, lambda v: v.isNotNull())).alias("_v"))
        .select(
            F.lit(node).alias("node"),
            "row_key",
            F.col("_v.property").alias("property"),
            F.col("_v.violation").alias("violation"),
            F.col("_v.value").alias("value"),
        )
    )


def check_constraints(
    tables: NodeTables, model: Model, node_id_field: dict[str, str] | None = None
) -> DataFrame:
    """Union of per-node violation reports."""
    node_id_field = node_id_field or {}
    reports = [
        check_node_constraints(df, model, node, node_id_field.get(node))
        for node, df in tables.items()
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
