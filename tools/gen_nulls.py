#!/usr/bin/env python
"""Source-NULL injection fixture: seeded NULL / empty / whitespace
values in every non-key column.

Sixth matrix axis (r15, scoped in BASELINE r14). The contract
fixtures carry ZERO source NULLs, so every source-null code path in
the registry — null groups in GROUP BY, null ordering in ORDER BY /
window ORDER BY, null propagation through string/date/JSON
expressions, Python-boundary (pandas_udf) None handling — is
differential-untested; generated nulls (outer joins, NULLIF) are the
only exercised form. This fixture takes the sf0.01 contract data and
injects, per non-key column with a stable per-(table, column) seed:

  * ~4% NULLs (all injectable types: string, numeric, timestamp),
  * ~1% empty strings and ~1% whitespace-only strings for string
    columns — the reference's O3 empty-string-vs-NULL semantic
    (cds-transformation_v1.3.py:134) makes these distinct dirty
    forms, not equivalent ones.

Key columns (join/identity keys) are never touched, so referential
structure survives. Tiny dimensions (region, nation) get exactly one
NULL (plus one empty string when ≥25 rows) to keep the group
structure recognizable while still firing the null-group branch.

Known expected finding class before any sweep (BASELINE r14): ASC
`ORDER BY … LIMIT` on a now-nullable column diverges by engine
default null position (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST;
implementation-defined in ANSI) — fix is an explicit NULLS
FIRST/LAST on both sides.

Usage: python tools/gen_nulls.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Join/identity keys stay intact — the axis tests value-null paths,
# not broken referential structure.
KEY_COLUMNS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey",
                 "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    # embeddings.embedding stays intact: the scoped axis is
    # strings/numerics/dates/props (BASELINE r14); whole-vector
    # nulls are a separately-scoped robustness question.
    "embeddings": {"vec_id", "embedding"},
}

TABLES = list(KEY_COLUMNS)

NULL_RATE = 0.04
EMPTY_RATE = 0.01
WS_RATE = 0.01
WS_VALUES = (" ", "  ", "\t")


def _col_rng(seed: int, table: str, col: str) -> np.random.Generator:
    # hash() is process-salted; crc32 gives a stable per-column seed.
    return np.random.default_rng(
        (seed << 16) ^ zlib.crc32(f"{table}.{col}".encode())
    )


def _inject(
    arr: pa.ChunkedArray,
    typ: pa.DataType,
    rng: np.random.Generator,
    n: int,
) -> pa.Array | pa.ChunkedArray:
    small = n < 200
    k_null = 1 if small else max(1, round(n * NULL_RATE))
    is_str = pa.types.is_string(typ) or pa.types.is_large_string(typ)
    k_empty = k_ws = 0
    if is_str:
        k_empty = (1 if n >= 25 else 0) if small \
            else max(1, round(n * EMPTY_RATE))
        k_ws = 0 if small else max(1, round(n * WS_RATE))
    idx = rng.choice(n, size=k_null + k_empty + k_ws, replace=False)
    null_idx = idx[:k_null]
    empty_idx = idx[k_null:k_null + k_empty]
    ws_idx = idx[k_null + k_empty:]

    mask = np.zeros(n, dtype=bool)
    mask[null_idx] = True
    out = pc.if_else(pa.array(mask), pa.scalar(None, typ), arr)
    if k_empty:
        mask = np.zeros(n, dtype=bool)
        mask[empty_idx] = True
        out = pc.if_else(pa.array(mask), pa.scalar("", typ), out)
    for j, ws in enumerate(WS_VALUES):
        sel = ws_idx[j::len(WS_VALUES)]
        if len(sel) == 0:
            continue
        mask = np.zeros(n, dtype=bool)
        mask[sel] = True
        out = pc.if_else(pa.array(mask), pa.scalar(ws, typ), out)
    return out


def generate(src: str, out: str, seed: int = 20260817) -> None:
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        n = t.num_rows
        cols = []
        touched = []
        for field in t.schema:
            arr = t[field.name]
            if field.name not in KEY_COLUMNS[name]:
                arr = _inject(
                    arr, field.type,
                    _col_rng(seed, name, field.name), n,
                )
                touched.append(field.name)
            cols.append(arr)
        out_t = pa.table(cols, schema=t.schema)
        pq.write_table(
            out_t, os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: {n} rows, nulls into {touched}", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/cds_etl_spark_wh/nulls/sf0.01"
    )
    generate(src, out)
    print(out)
