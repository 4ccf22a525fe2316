"""Derived warehouse columns — the pre-projected kernel layout.

BASELINE r6's sf10 kernel experiments identified the per-row scan
work that separates the remaining >2× queries from DuckDB's kernels:
double→cents casts on money aggregates (the q2/qs161 family) and
re-tokenizing document text on every corpus job (qs157's split —
the same economics the shingle index fixes for gram hashing). Both
are pure per-row projections, so a warehouse can pay them ONCE at
ingest and store the result as extra columns.

This module defines that layout. ``with_derived`` appends the
columns; queries use them OPPORTUNISTICALLY — each expression here is
byte-for-byte the expression the consuming query would compute
inline, so a query that finds its derived column present reads it
instead and produces identical values (equivalence-tested in
tests/test_derived_layout.py). Raw directories never carry the
columns, so contract runs against /root/testdata are untouched, and
the DuckDB oracles (which run on the raw files) stay valid.

ON by default in bench ingest (``SPARK_GRAFT_BENCH_CENTS=0`` opts
out): the measured effect at sf10 is 1.55x on qs161, 1.33x on qs157
and 0.98x (neutral) on bench q2, so the layout pays for money-agg /
tokenize shapes and costs nothing elsewhere; it changes only the
stored warehouse schema, never the raw contract tables
(BASELINE.md records the decision). At 100 TB
the same trade is standard warehouse practice: materialize the
deterministic per-row projections your workload aggregates over.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cents_half_up(col: str) -> Column:
    # (x*100 + 0.5)::long — identical to qs10's in-plan extraction
    # (exact for positive 2-dp money doubles; see qs10 docstring).
    return (F.col(col) * 100 + F.lit(0.5)).cast("long")


#: table -> {derived column -> zero-arg Column factory}. Factories
#: (not Columns: building a Column needs a live SparkContext, and this
#: module must import session-free) MUST mirror the consuming query's
#: inline computation exactly — value equivalence is the contract; the
#: tests pin it.
DERIVED: dict[str, dict[str, "Callable[[], Column]"]] = {
    "lineitem": {
        # qs10 / bench q2 (TPC-H Q1 money family)
        "l_quantity_cents": lambda: _cents_half_up("l_quantity"),
        "l_extendedprice_cents": lambda: _cents_half_up("l_extendedprice"),
        # the discounted-price product stays double on purpose —
        # qs10 sums the per-row double product (bit-identical per row)
        "l_discprice": lambda: F.col("l_extendedprice")
        * (1 - F.col("l_discount")),
    },
    "orders": {
        # qs161 winsorized mean (round-half-up cents + fixed histogram
        # bucket, both exactly as computed in-plan)
        "o_totalprice_cents": lambda: F.round(
            F.col("o_totalprice") * 100, 0
        ).cast("bigint"),
        "o_price_bucket128": lambda: F.least(
            F.greatest(
                F.floor(F.col("o_totalprice") / 4096.0).cast("bigint"),
                F.lit(0),
            ),
            F.lit(127),
        ),
    },
    "documents": {
        # qs157-family tokenization (lowercase, split, drop empties) —
        # the corpus is tokenized once at ingest instead of per query
        "toks_lc": lambda: F.filter(
            F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
        ),
    },
}


def with_derived(df: DataFrame, table: str) -> DataFrame:
    """Append the table's derived columns (no-op for tables without)."""
    cols = DERIVED.get(table)
    if not cols:
        return df
    return df.withColumns({name: make() for name, make in cols.items()})


def has_derived(df: DataFrame, table: str, *names: str) -> bool:
    """True when every named derived column is present on ``df``.

    The opportunistic-read check queries use; names are validated
    against DERIVED so a typo fails loudly instead of silently always
    reading the raw columns."""
    declared = DERIVED.get(table, {})
    for n in names:
        if n not in declared:
            raise KeyError(f"{n} is not a declared derived column of {table}")
    return all(n in df.columns for n in names)
