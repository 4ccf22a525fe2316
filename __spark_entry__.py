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
    # -- r12 window (first 50 graded): the 9 official re-grades whose
    #    plans changed this round (the six corpus-proportional
    #    F.broadcast hint removals qs231/qs356/qs357/qs365/qs372/qs377,
    #    the qs363 sign-safe weekday modulus, and the qs352/qs380
    #    shared-pipeline refactor — all values verified unchanged vs
    #    DuckDB at both SFs before staging), then 41 of the 49 rows
    #    whose most recent official grade is CORRECTNESS_r04 — the
    #    stalest cohort in the cumulative record (no r01-r03-era rows
    #    remain; everything older was already re-graded r04+). All 49
    #    r04 rows re-proved EQUAL at sf0.01 on this tree before
    #    staging; the remaining 8 lead the next rotation. --
    "qs231_modularity",
    "qs352_fleiss_kappa",
    "qs356_l_diversity",
    "qs357_t_closeness",
    "qs363_seasonal_strength",
    "qs365_pmi_collocations",
    "qs372_source_kl_matrix",
    "qs377_cramer_von_mises",
    "qs380_gwet_ac1",
    "qs09_asof_join",
    "qs117_tpch_q7",
    "qs118_tpch_q10",
    "qs119_bigram_lm",
    "qs120_graph_bfs",
    "qs121_pareto_frontier",
    "qs122_minhash_signatures",
    "qs123_event_transitions",
    "qs124_quality_filter",
    "qs16_pivot",
    "qs17_grouping_sets",
    "qs24_window_navigation",
    "qs25_global_topk",
    "qs26_intersect",
    "qs27_except",
    "qs28_union_all",
    "qs29_setops_all",
    "qs30_string_functions",
    "qs32_datetime_functions",
    "qs33_math_functions",
    "qs34_json_extraction",
    "qs35_array_functions",
    "qs37_levenshtein",
    "qs38_date_arithmetic",
    "qs39_conditional_agg",
    "qs40_case_coalesce",
    "qs41_distinct",
    "qs42_having",
    "qs47_map_aggregation",
    "qs49_in_subquery",
    "qs50_word_count",
    "qs51_dedup_blocking",
    "qs52_cosine_topk",
    "qs53_vector_group_agg",
    "qs55_minhash_lsh_pairs",
    "qs57_ngram_jaccard_pairs",
    "qs58_embedding_neardup",
    "qs59_ivf_topk",
    "qs60_document_profile",
    "qs61_cosine_topk_pandas",
    "qs62_approx_count_distinct",
    # -- next rotation: the 8 r04-era rows the 50-slot window missed --
    "qs63_approx_quantiles",
    "qs65_hash_sample",
    "qs67_stratified_sample",
    "qs68_interleave_sources",
    "qs69_unpivot",
    "qs70_grouping_id",
    "qs71_rank_pct",
    "qs94_pagerank",
    # -- r12 additions (qs383-qs392, the round-12 diagnostics2 family):
    #    each passed both-SF driver_diff + intent + bounds before
    #    registration; they queue behind the 8 r04 rows above for the
    #    r13 window. --
    "qs383_somers_d",
    "qs384_stuart_tau_c",
    "qs385_scott_pi",
    "qs386_yule_q",
    "qs387_ansari_bradley",
    "qs388_ww_runs",
    "qs389_mrr_eval",
    "qs390_kpss",
    "qs391_wasserstein",
    "qs392_lorenz_asymmetry",
    # -- already officially graded r05+ (rotated to the back; order --
    # -- preserves the r11 staging history for reference) --
    "qs241_chi_square_independence",
    "qs159_psi_drift",
    "qs351_levene_test",
    "qs353_turning_points",
    "qs354_periodogram",
    "qs355_variance_ratio",
    "qs358_breusch_pagan",
    "qs359_overdispersion",
    "qs360_boilerplate_ngrams",
    "qs361_gk_lambda",
    "qs362_dagostino_skew",
    "qs364_sprt_ab",
    "qs366_heaps_law",
    "qs367_cox_stuart",
    "qs368_bartels_rank",
    "qs369_hartley_fmax",
    "qs370_hoover_index",
    "qs371_atkinson_index",
    "qs373_adjusted_rand",
    "qs374_fowlkes_mallows",
    "qs375_hosmer_lemeshow",
    "qs376_youden_threshold",
    "qs378_theil_decomposition",
    "qs379_quintile_shares",
    "qs381_seasonal_mann_kendall",
    "qs382_wilcoxon_signed_rank",
    "qs157_perplexity_buckets",
    "qs158_epoch_shard_plan",
    "qs160_token_entropy",
    "qs161_winsorized_mean",
    "qs162_interval_overlap_binned",
    "qs163_prefix_filter_simjoin",
    "qs164_sequence_mining",
    "qs165_sweepline_concurrency",
    "qs166_mutual_information",
    "qs167_zscore_anomaly",
    "qs168_ab_proportion_ztest",
    "qs169_changepoint_meanshift",
    "qs170_hll_intersection",
    "qs171_cms_join_size",
    "qs172_weighted_shortest_path",
    "qs173_ewma_smoothing",
    "qs174_benford_audit",
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
    "qs302_runs_test",
    "qs303_durbin_watson",
    "qs304_moods_median",
    "qs305_mann_kendall",
    "qs306_grubbs_outlier",
    "qs307_gini_balances",
    "qs308_split_leakage",
    "qs309_bartlett_test",
    "qs310_cliffs_delta",
    "qs311_cohens_d",
    "qs312_anova_effect_sizes",
    "qs313_k_anonymity",
    "qs314_filter_yield_audit",
    "qs315_dedup_cluster_stats",
    "qs316_partial_correlation",
    "qs317_process_capability",
    "qs318_ljung_box",
    "qs319_cochran_q",
    "qs320_pettitt_changepoint",
    "qs321_kendalls_w",
    "qs210_rfm_segments",
    "qs248_kmeans_update",
    "qs322_pages_trend",
    "qs323_hodges_lehmann",
    "qs324_siegel_tukey",
    "qs326_bowker_symmetry",
    "qs327_ordinal_association",
    "qs329_gini_mean_difference",
    "qs340_temporal_conformance",
    "qs330_average_precision",
    "qs331_matthews_corr",
    "qs332_brier_decomposition",
    "qs333_binned_logloss",
    "qs334_adamic_adar",
    "qs335_zipf_slope",
    "qs336_xyz_classification",
    "qs337_association_metrics",
    "qs338_croston_forecast",
    "qs341_shingle_containment",
    "qs325_breslow_day",
    "qs328_quade_test",
    "qs339_cucconi_test",
    "qs343_kupiec_pof",
    "qs345_hurst_exponent",
    "qs350_theil_index",
    "qs346_dixon_q",
    "qs347_weighted_kappa",
    "qs348_entropy_profile",
    "qs349_page_hinkley",
    "qs230_var_cvar",
    "qs252_vocab_jaccard_sources",
    "qs253_burrows_delta",
    "qs254_mcnemar_paired",
    "qs255_bm25_topk",
    "qs256_frequent_triples",
    "qs257_rrf_fusion",
    "qs258_fd_profile",
    "qs259_decision_stump",
    "qs260_hits_scores",
    "qs261_cochran_armitage",
    "qs262_ngram_novelty",
    "qs263_rake_keyphrases",
    "qs264_calibration_ece",
    "qs265_neyman_allocation",
    "qs266_temporal_consistency",
    "qs267_markov_entropy_rate",
    "qs268_weighted_vocab_jaccard",
    "qs269_logrank_test",
    "qs270_welch_ttest",
    "qs271_kruskal_wallis",
    "qs272_anova_oneway",
    "qs273_cramers_v",
    "qs274_js_divergence",
    "qs275_cuped_lift",
    "qs276_bh_fdr",
    "qs277_cmh_odds",
    "qs278_jarque_bera",
    "qs279_granger_lag",
    "qs280_matching_att",
    "qs281_inventory_policy",
    "qs282_price_dispersion",
    "qs283_interpurchase_intervals",
    "qs284_poisson_gof",
    "qs285_clustering_coefficient",
    "qs286_weekly_ohlc",
    "qs287_fisher_index",
    "qs288_dunn_posthoc",
    "qs289_friedman_test",
    "qs290_cronbach_alpha",
    "qs291_brown_forsythe",
    "qs292_mde_power",
    "qs293_dedup_threshold_sweep",
    "qs294_rich_club",
    "qs295_langid_f1_eval",
    "qs296_rmst",
    "qs297_negbinomial_fit",
    "qs298_jonckheere_trend",
    "qs299_kendall_taub",
    "qs300_validation_scorecard",
    "qs301_theils_u",
    "qs207_feature_hashing",
    "qs208_quantile_normalization",
    "qs209_seasonal_decompose",
    "qs211_herfindahl_index",
    "qs212_readability",
    "qs213_knn_accuracy",
    "qs214_degree_assortativity",
    "qs215_ndcg_retrieval_eval",
    "qs216_did_estimator",
    "qs217_laspeyres_index",
    "qs218_dbscan_core_points",
    "qs219_abc_classification",
    "qs220_segment_migration",
    "qs221_mase_forecast_eval",
    "qs222_jaccard_link_prediction",
    "qs223_event_study_lift",
    "qs224_log_odds_keywords",
    "qs225_golden_record",
    "qs226_vocab_coverage",
    "qs227_ks_two_sample",
    "qs228_simpson_detector",
    "qs229_eb_shrinkage",
    "qs232_xmr_control_chart",
    "qs233_blocking_recall_eval",
    "qs234_wilson_interval",
    "qs235_token_burstiness",
    "qs236_mix_shift_decomposition",
    "qs237_seasonal_index_ratio",
    "qs238_order_aging_buckets",
    "qs239_tukey_fences",
    "qs240_lexical_diversity",
    "qs46_full_outer_join",
    "qs48_time_range_frame",
    "qs66_hash_split",
    "qs82_sequence_packing",
    "qs89_repetition_signal",
    "qs242_cusum_drift",
    "qs243_spearman_corr",
    "qs244_langid_kappa_eval",
    "qs245_gains_lift_deciles",
    "qs246_nelson_aalen",
    "qs247_position_attribution",
    "qs249_kcore_decomposition",
    "qs250_label_propagation",
    "qs251_price_elasticity",
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
