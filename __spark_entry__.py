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
    # -- r16 window (first 50 graded). Composition rule (VERDICT r15
    #    task 8): no formula or oracle changed this round (the r16
    #    optimization work is plan-physics only — qs138's spread
    #    removal, the pin_stage reclassifications — and the r14
    #    changed-query rule therefore binds nothing), so the window
    #    takes the 50 rows with the OLDEST latest official grade:
    #    all 16 remaining r06 rows, all 32 r07 rows, and the two
    #    alphabetically-first r08 rows (qs207, qs208). Computed
    #    mechanically from CORRECTNESS_r01..r15 hash_match history;
    #    after this round no row's latest grade predates r08. --
    "qs153_unpivot_measures",
    "qs154_histogram_quantile_sketch",
    "qs155_token_cooccurrence",
    "qs156_robust_outliers",
    "qs15_min_max_stddev",
    "qs20_topk_per_group",
    "qs23_window_aggregate",
    "qs36_higher_order_arrays",
    "qs44_percentile_exact",
    "qs45_correlated_scalar_subquery",
    "qs54_exact_dedup",
    "qs56_simhash",
    "qs64_salted_agg",
    "qs90_hll_distinct_sketch",
    "qs96_anonymize",
    "qs98_incremental_agg",
    "qs175_key_skew_diagnosis",
    "qs176_last_touch_attribution",
    "qs177_winnow_fingerprints",
    "qs178_sparse_cosine_neighbors",
    "qs179_bootstrap_ci",
    "qs180_clamped_balance",
    "qs181_mannwhitney_auc",
    "qs182_kaplan_meier",
    "qs183_weighted_median",
    "qs184_powerlaw_fit",
    "qs185_rolling_actives",
    "qs186_session_stats",
    "qs187_basket_lift",
    "qs188_time_to_convert",
    "qs189_lorenz_deciles",
    "qs190_dow_seasonality",
    "qs191_new_vs_returning",
    "qs192_cohort_ltv",
    "qs193_duplicate_payments",
    "qs194_ship_sla",
    "qs195_supplier_activity_islands",
    "qs196_embedding_drift",
    "qs197_percent_of_parent",
    "qs198_rank_movers",
    "qs199_scd2_dimension",
    "qs200_proration_cents",
    "qs201_date_spine_fill",
    "qs202_group_ols_trend",
    "qs203_funnel_conversion",
    "qs204_autocorrelation",
    "qs205_theilsen_slope",
    "qs206_grid_spatial_pairs",
    "qs207_feature_hashing",
    "qs208_quantile_normalization",
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
