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
    # -- r15 window (first 50 graded). Composition rule (VERDICT r14
    #    task 2 + the r14 changed-query rule): the 31 queries whose
    #    ORACLE SQL changed since the r14 close (the NULL-axis fixes
    #    3782ca3 — pinned NULLS FIRST/LAST, TRY_CAST complete-case
    #    filters, null-safe bounds joins, json_valid guards — and the
    #    chi-square GREATEST(...,0) clamps 925eb54) MUST re-earn their
    #    official grade in the round that changed them; the remaining
    #    19 slots take the alphabetically-first rows whose latest
    #    official grade is r06 (qs113_recursive_cte leads). Changed
    #    set computed mechanically: ORACLE_SQL text diff vs the r14
    #    close tree (90f6d96) — 31 names, zero added/removed. The
    #    displaced r06/r07 rows lead the r16 rotation. All 50 re-proven
    #    EQUAL at sf0.01 on this tree (tools/driver_diff.py --all at
    #    round close). Optimization-round plan restructures keep
    #    formulas and oracles identical and do not displace grades. --
    "qs21_ranking_family",
    "qs22_lag_lead_rows_frame",
    "qs241_chi_square_independence",
    "qs24_window_navigation",
    "qs261_cochran_armitage",
    "qs273_cramers_v",
    "qs298_jonckheere_trend",
    "qs299_kendall_taub",
    "qs322_pages_trend",
    "qs327_ordinal_association",
    "qs328_quade_test",
    "qs33_math_functions",
    "qs347_weighted_kappa",
    "qs34_json_extraction",
    "qs357_t_closeness",
    "qs377_cramer_von_mises",
    "qs37_levenshtein",
    "qs383_somers_d",
    "qs384_stuart_tau_c",
    "qs386_yule_q",
    "qs387_ansari_bradley",
    "qs388_ww_runs",
    "qs391_wasserstein",
    "qs394_kuiper",
    "qs395_anderson_darling",
    "qs396_brunner_munzel",
    "qs397_lepage",
    "qs398_g_test",
    "qs399_cramers_v",
    "qs43_sessionize",
    "qs47_map_aggregation",
    "qs113_recursive_cte",
    "qs114_fuzzy_link",
    "qs115_tfidf_top_terms",
    "qs116_cohort_retention",
    "qs11_count_distinct",
    "qs12_rollup",
    "qs13_cube",
    "qs142_duplicate_span_coverage",
    "qs143_hll_register_table",
    "qs144_dsir_importance_weights",
    "qs145_bpe_pair_step",
    "qs146_semantic_dedup",
    "qs147_gopher_quality_rules",
    "qs148_pii_scan_redact",
    "qs149_temperature_mixing",
    "qs14_combine_rows_string_agg",
    "qs150_incremental_minhash_dedup",
    "qs151_pq_ann",
    "qs152_bloom_decontaminate",
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
