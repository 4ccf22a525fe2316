#!/usr/bin/env python
"""Reproducible DuckDB baseline measurement for BASELINE.md.

Measures the 8 headline query shapes (bench.py Q1-Q8; texts are the
oracle SQL from cds_etl_spark.plans where one exists) on DuckDB 1.0
over the same parquet tables, same machine, and prints one JSON line.

Protocol (mirrors bench.py's Spark protocol; both documented in
BASELINE.md "Bench contract"):

* warm: every query runs once before any timing;
* full execution: results are materialized to Arrow (columnar handoff,
  the closest client-side analogue of Spark's `noop` sink — round 1's
  baseline accidentally timed `con.sql()` lazily for Q1, recording a
  0.6 ms "scan" of 600k rows that never executed; `.arrow()` forces
  execution);
* sequential: per-query best of RUNS on one connection;
* concurrent batch: all 8 queries submitted at once from THREADS
  threads (one cursor each over the same database), wall time, best of
  BATCH_RUNS — DuckDB's own optimal scheduling for the batch on this
  box is measured, not assumed (with cheap Arrow materialization the
  concurrent batch is ~2.5x faster than the sequential sum; with
  fetchall() it is SLOWER — GIL-bound row conversion — which is why
  the materialization choice is pinned here).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cds_etl_spark.plans import ORACLE_SQL

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 8
BATCH_RUNS = 14
THREADS = 8

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

QUERIES = {
    "q1": ORACLE_SQL["qs01_scan_filter_project"],
    "q2": ORACLE_SQL["qs10_groupby_agg_tpch_q1"],
    # bench.py defines q3/q7 inline (join+agg, CASE mapping) — the SQL
    # equivalents:
    "q3": (
        "SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(o_totalprice),2) AS total "
        "FROM orders JOIN customer ON o_custkey=c_custkey GROUP BY c_mktsegment"
    ),
    "q4": ORACLE_SQL["qs41_distinct"],
    "q5": ORACLE_SQL["qs14_combine_rows_string_agg"],
    "q6": ORACLE_SQL["qs31_regex_filter"],
    "q7": (
        "SELECT event_id, CASE WHEN event_type='click' THEN 'Click' "
        "WHEN event_type='purchase' THEN 'Purchase' "
        "ELSE 'Not specified in data' END AS mapped FROM events"
    ),
    "q8": ORACLE_SQL["qs20_topk_per_group"],
}


def measure(sf_dir: str = SF_DIR) -> dict:
    """Run the full warm sequential + concurrent-batch protocol and
    return the result dict. Importable (bench.py pairs every official
    Spark artifact with a SAME-WINDOW DuckDB point — r12 verdict task
    5: the contract ratio must not depend on a constant measured on a
    different box-day)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    for q in QUERIES.values():  # warm
        con.sql(q).arrow()

    seq: dict[str, float] = {}
    for name, q in QUERIES.items():
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(q).arrow()
            best = min(best, time.perf_counter() - t0)
        seq[name] = round(best, 4)

    pool = ThreadPoolExecutor(THREADS)

    def one(q: str) -> None:
        cur = con.cursor()
        cur.sql(q).arrow()

    def batch() -> float:
        t0 = time.perf_counter()
        futures = [pool.submit(one, q) for q in QUERIES.values()]
        for fut in futures:
            fut.result()
        return time.perf_counter() - t0

    for _ in range(2):
        batch()
    runs = sorted(batch() for _ in range(BATCH_RUNS))
    pool.shutdown()
    con.close()

    return {
        "engine": f"duckdb {duckdb.__version__}",
        "queries": seq,
        "sequential_total": round(sum(seq.values()), 4),
        "batch_best": round(runs[0], 4),
        "batch_median": round(runs[len(runs) // 2], 4),
        "mode": f"arrow_materialize_concurrent{THREADS}_bestof{BATCH_RUNS}",
        "sf_dir": sf_dir,
    }


def main() -> None:
    print(json.dumps(measure(SF_DIR)))


if __name__ == "__main__":
    main()
