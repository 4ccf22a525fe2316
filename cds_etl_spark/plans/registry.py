"""Declared oracle-checkable query set (SURVEY.md §2.2, the t2 contract).

Each query exists twice:
  * a Spark implementation — idiomatic DataFrame API, registered in
    ``QUERIES[name] = fn(spark, sf_dir) -> DataFrame``;
  * an equivalent DuckDB SQL string in ``ORACLE_SQL[name]``, run by the
    driver on the same parquet tables.

The two must agree on row count, column names (the comparator sorts
columns by name) and values (order-insensitive hash). Hence:
  * every computed column is aliased identically on both sides;
  * double aggregates are ROUNDed (2–4 dp) to kill accumulation-order
    noise;
  * integer-ish functions that differ in width between engines
    (rank/year/length → Spark INT, DuckDB BIGINT) are CAST on the
    DuckDB side to Spark's type;
  * DuckDB's ``dayofweek`` is Sunday=0 while Spark's is Sunday=1 — the
    oracle adds 1;
  * queries with LIMIT carry a total ORDER BY so the kept rows are
    deterministic.

Query shapes trace back to reference operators (cited per query; file
paths are into /root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # A duplicate registration would silently SHADOW the earlier
        # query — the registry is the correctness contract, so fail at
        # import time instead.
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco

