"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``cds_etl_spark`` (see SURVEY.md §2 for the
operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cds_etl_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["qs10_groupby_agg_tpch_q1"](spark, "/root/testdata/sf0.001")


# The round driver grades the FIRST 50 registry entries. Rounds rotate
# which queries occupy that window so every query accumulates a recent
# green driver row (full history of r01-r11 windows: git log on this
# file). Every name below MUST exist in the registry —
# tests/test_sql_surface.py asserts set(_GRADE_FIRST) <= set(QUERIES)
# so a typo fails loudly instead of silently falling back to
# registration order (the r03 defect).
_GRADE_FIRST = [
    # -- r14 window (first 50 graded): re-grade rotation, no new
    #    queries this round (VERDICT r13 task 2). Composition: ALL 31
    #    rows whose latest official grade dates to r05 (qs31, qs72-qs99
    #    singles, the qs134-qs141 LLM/TPC-H cohort), 12 of the
    #    alphabetically-first r06-era rows, and the SEVEN queries whose
    #    forms changed this round — a changed query must re-earn its
    #    official grade in the round that changed it: the chi-square
    #    empty-cell fixes (qs399 + bug-class sweep qs241, qs273,
    #    qs174), the zipf-fixture sweep findings (qs293 oracle
    #    NULL-struct count, qs337 -0.0 canonicalization), and the
    #    permuted-layout-axis finding (qs33 tie-dependent LIMIT cutoff
    #    — ordering extended to all output columns; qs113_recursive_cte
    #    was evicted to make room and keeps its r06 grade). After this
    #    round no row is older than r06; the remaining 38 r06 rows
    #    (qs113, qs114, qs115, qs116, qs11, qs12, qs13_cube, qs142...)
    #    lead the r15 rotation. All 50 re-proved EQUAL at sf0.01 on
    #    this tree before staging (tools/driver_diff.py). --
    "qs134_corpus_mixing_weights",
    "qs135_duplicate_spans",
    "qs136_rag_chunks",
    "qs137_sketch_heavy_hitters",
    "qs138_repetition_rowlocal",
    "qs139_tpch_q13_custdist",
    "qs140_tpch_q8_market_share",
    "qs141_tpch_q6_forecast",
    "qs31_regex_filter",
    "qs72_sequence_explode",
    "qs73_bitwise",
    "qs74_nullsafe_join",
    "qs75_greatest_least",
    "qs76_string_pad",
    "qs77_try_cast",
    "qs78_scalar_subquery",
    "qs79_width_bucket",
    "qs80_regexp_extract_replace",
    "qs81_connected_dedup",
    "qs83_decontaminate",
    "qs84_bm25",
    "qs85_scd2_apply",
    "qs86_corr_covar",
    "qs87_regression_agg",
    "qs88_profile_columns",
    "qs91_llm_pipeline_manifest",
    "qs92_forward_fill",
    "qs93_resample_grid",
    "qs95_table_diff",
    "qs97_weighted_sample",
    "qs99_funnel",
    "qs08_range_join",
    "qs100_tpch_q3",
    "qs103_tpch_q5",
    "qs104_inverted_index",
    "qs105_cap_per_group",
    "qs106_cumulative_distinct",
    "qs107_merge_upsert",
    "qs108_triangle_count",
    "qs109_tpch_q18",
    "qs110_cms_sketch",
    "qs111_segment_dedup",
    "qs112_lsh_buckets",
    "qs33_math_functions",
    "qs293_dedup_threshold_sweep",
    "qs337_association_metrics",
    "qs174_benford_audit",
    "qs399_cramers_v",
    "qs241_chi_square_independence",
    "qs273_cramers_v",
]


def _ordered(mapping: dict) -> dict:
    first = {n: mapping[n] for n in _GRADE_FIRST if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in first}
    return {**first, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry.

    Keys absent here (non-SQL-expressible ops) get the driver's weaker
    rows-only check.
    """
    return _ordered(dict(ORACLE_SQL))
