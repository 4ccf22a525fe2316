"""Enum normalization + value mapping — the reference's `clean_data`
(O19, cds_transformation_functions.py:10-74).

Per column whose model property is Enum-typed (and whose enum is not a
lone TBD/'not reported' placeholder, :30):
    value ∈ enum                → keep (:53-54)
    value ∈ clean-dict synonyms → mapped replacement (:37-42)
    value NULL & nan_value set  → nan_value default (:43-44)
    value ∈ extra_long_values   → 'Not specified in data' (:45-47)
    else                        → passthrough (:48-50)
Integer-typed properties get integral-float coercion (:56-72): a float
cell equal to its int truncation renders as the int; strings are NEVER
coerced (int('42') != '42' fails the reference's `value == int_value`
equality, and int('42.0') raises — both keep the original).

The reference loops value-by-value through Python dict lookups; here
each column compiles to ONE expression: membership against a literal
array, a map-literal lookup (`element_at` over `create_map` — the
clean dict is dimension-sized, so it ships to executors as literals in
the plan, the broadcast-join-free form of a broadcast map join), and
CASE/COALESCE — all whole-stage-codegen.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cds_etl_spark.model import Model

NodeTables = dict[str, DataFrame]

NOT_SPECIFIED = "Not specified in data"
_PLACEHOLDER_ENUMS = {"TBD", "not reported"}


def _enum_clean_expr(
    col: str,
    enum: tuple[str, ...],
    synonyms: dict,
    extra_long: list[str],
) -> Column:
    c = F.col(f"`{col}`")
    s = c.cast("string")
    mapping = {str(k): str(v) for k, v in synonyms.items() if k != "nan_value"}
    mapped = (
        F.element_at(
            F.create_map(*list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in mapping.items()))),
            s,
        )
        if mapping
        else F.lit(None)
    )
    nan_value = synonyms.get("nan_value")
    null_branch = F.lit(nan_value) if nan_value is not None else c
    long_branch = (
        F.when(s.isin([str(v) for v in extra_long]), F.lit(NOT_SPECIFIED)) if extra_long else F.lit(None)
    )
    return (
        F.when(s.isin(list(enum)), c)
        .when(c.isNull(), null_branch)
        .otherwise(F.coalesce(mapped, long_branch, c))
        .alias(col)
    )


def _integer_coerce_expr(df: DataFrame, col: str) -> Column:
    """Integral floats → int rendering; everything else untouched.

    Double columns become canonical strings ('42.0' → '42', 42.5 →
    '42.5') mirroring the reference's mixed int/float object column as
    it serializes to TSV. String/long columns pass through (the
    reference never successfully coerces strings, see module doc).
    """
    c = F.col(f"`{col}`")
    dtype = dict(df.dtypes)[col]
    if dtype in ("double", "float"):
        return (
            F.when(c.isNull(), F.lit(None).cast("string"))
            .when(c == F.floor(c), c.cast("long").cast("string"))
            .otherwise(c.cast("string"))
            .alias(col)
        )
    return c.alias(col)


def clean_data(tables: NodeTables, model: Model, clean_dict: dict) -> NodeTables:
    """Apply enum cleaning + integer coercion across every node table."""
    extra_long = list(clean_dict.get("extra_long_values") or [])
    out = {}
    for node, df in tables.items():
        exprs = []
        for col in df.columns:
            pdef = model.props.get(col)
            if pdef is None:
                exprs.append(F.col(f"`{col}`"))
                continue
            if pdef.enum is not None:
                single_placeholder = (
                    len(pdef.enum) == 1 and pdef.enum[0] in _PLACEHOLDER_ENUMS
                )
                if single_placeholder:
                    exprs.append(F.col(f"`{col}`"))
                else:
                    exprs.append(
                        _enum_clean_expr(col, pdef.enum, clean_dict.get(col, {}) or {}, extra_long)
                    )
            elif pdef.type == "integer":
                exprs.append(_integer_coerce_expr(df, col))
            else:
                exprs.append(F.col(f"`{col}`"))
        out[node] = df.select(*exprs)
    return out
