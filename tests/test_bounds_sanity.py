"""Mathematical-bounds sanity gate (r10).

qs241 shipped a Cramér's V of 1.27 — above the statistic's hard upper
bound of 1 — and stayed green for two rounds because the oracle
mirrored the same inflation. Range violations like that are cheap to
catch mechanically: every bounded statistic in the registry is listed
here with its mathematical range, and this test runs each owning
query at sf0.001 and asserts no output value can exist outside it.
This is NOT a formula check (test_intent_audit.py does that); it is
the impossible-value tripwire that fires even when engine, oracle,
and the intent reference are all wrong together.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cds_etl_spark.plans import QUERIES

# (query, column, lo, hi) — closed intervals; None = unbounded side.
BOUNDS = [
    ("qs159_psi_drift", "psi", 0.0, None),
    ("qs181_mannwhitney_auc", "auc_e6", 0, 1_000_000),
    ("qs182_kaplan_meier", "survival", 0.0, 1.0),
    ("qs214_degree_assortativity", "assortativity", -1.0, 1.0),
    ("qs215_ndcg_retrieval_eval", "ndcg_e6", 0, 1_000_000),
    ("qs231_modularity", "modularity_e6", -1_000_000, 1_000_000),
    ("qs234_wilson_interval", "ci_lo", 0.0, 1.0),
    ("qs234_wilson_interval", "ci_hi", 0.0, 1.0),
    ("qs234_wilson_interval", "p_center", 0.0, 1.0),
    ("qs241_chi_square_independence", "cramers_v", 0.0, 1.0),
    ("qs243_spearman_corr", "spearman_rho", -1.0, 1.0),
    ("qs244_langid_kappa_eval", "accuracy", 0.0, 1.0),
    ("qs244_langid_kappa_eval", "kappa", -1.0, 1.0),
    ("qs264_calibration_ece", "accuracy", 0.0, 1.0),
    ("qs264_calibration_ece", "confidence", 0.0, 1.0),
    ("qs273_cramers_v", "cramers_v", 0.0, 1.0),
    ("qs274_js_divergence", "jsd_nats", 0.0, math.log(2) + 1e-9),
    ("qs274_js_divergence", "jsd_bits", 0.0, 1.0 + 1e-9),
    ("qs276_bh_fdr", "conv0", 0.0, 1.0),
    ("qs276_bh_fdr", "conv1", 0.0, 1.0),
    ("qs276_bh_fdr", "p_two", 0.0, 1.0 + 1e-6),
    ("qs288_dunn_posthoc", "p_two", 0.0, 1.0 + 1e-6),
    ("qs290_cronbach_alpha", "cronbach_alpha", None, 1.0),
    ("qs294_rich_club", "phi", 0.0, 1.0),
    ("qs296_rmst", "surv_at_tau", 0.0, 1.0),
    ("qs299_kendall_taub", "tau_b", -1.0, 1.0),
    ("qs301_theils_u", "theils_u", 0.0, 1.0),
    ("qs303_durbin_watson", "dw", 0.0, 4.0),
    ("qs303_durbin_watson", "rho1", -1.0, 1.0),
    ("qs307_gini_balances", "gini", 0.0, 1.0),
    ("qs310_cliffs_delta", "cliffs_delta", -1.0, 1.0),
    ("qs312_anova_effect_sizes", "eta2", 0.0, 1.0),
    ("qs316_partial_correlation", "r_xy", -1.0, 1.0),
    ("qs316_partial_correlation", "r_xy_given_z", -1.0, 1.0),
    ("qs320_pettitt_changepoint", "p_approx", 0.0, 2.0),
    ("qs321_kendalls_w", "kendalls_w", 0.0, 1.0),
    ("qs327_ordinal_association", "gamma", -1.0, 1.0),
    ("qs327_ordinal_association", "somers_d_yx", -1.0, 1.0),
    ("qs327_ordinal_association", "somers_d_xy", -1.0, 1.0),
    ("qs327_ordinal_association", "tau_c", -1.0, 1.0),
    ("qs330_average_precision", "ap", 0.0, 1.0),
    ("qs331_matthews_corr", "mcc", -1.0, 1.0),
    ("qs332_brier_decomposition", "uncertainty", 0.0, 0.25),
    ("qs336_xyz_classification", "cv2_e6", 0, None),
    # hurst is a 4-point OLS slope on log(R/S) vs log(n): asymptotically
    # in [0,1] but NOT mathematically confined there at finite sample —
    # an empirical band, not a hard bound (r10 ADVICE).
    ("qs345_hurst_exponent", "hurst", -0.5, 1.5),
    ("qs347_weighted_kappa", "weighted_kappa", -1.0, 1.0),
    ("qs348_entropy_profile", "normalized", 0.0, 1.0 + 1e-9),
    ("qs350_theil_index", "theil_t", 0.0, None),
    ("qs350_theil_index", "theil_l", 0.0, None),
    ("qs351_levene_test", "levene_w", 0.0, None),
    ("qs352_fleiss_kappa", "p_bar", 0.0, 1.0),
    ("qs352_fleiss_kappa", "fleiss_kappa", None, 1.0),
    # norm_power = (C^2+S^2)/(2 n SS): Cauchy-Schwarz gives C^2 <= n*SS
    # and S^2 <= n*SS, so the ratio is hard-bounded in [0, 1].
    ("qs354_periodogram", "norm_power", 0.0, 1.0 + 1e-9),
    ("qs355_variance_ratio", "vr5", 0.0, None),
    ("qs356_l_diversity", "min_l", 1, None),
    ("qs357_t_closeness", "t_closeness", 0.0, 1.0 + 1e-9),
    ("qs357_t_closeness", "avg_emd", 0.0, 1.0 + 1e-9),
    ("qs358_breusch_pagan", "r2_aux", 0.0, 1.0 + 1e-9),
    ("qs358_breusch_pagan", "bp_lm", 0.0, None),
    ("qs359_overdispersion", "dispersion", 0.0, None),
    ("qs360_boilerplate_ngrams", "boiler_ratio", 0.0, 1.0 + 1e-9),
    ("qs361_gk_lambda", "lambda_seg_given_nat", 0.0, 1.0),
    ("qs361_gk_lambda", "lambda_nat_given_seg", 0.0, 1.0),
    ("qs363_seasonal_strength", "seasonal_strength", 0.0, 1.0),
    ("qs368_bartels_rank", "rvn", 0.0, None),
    ("qs369_hartley_fmax", "f_max", 1.0, None),
    ("qs370_hoover_index", "hoover", 0.0, 1.0),
    # AM-GM: geometric mean <= arithmetic mean for positive values
    ("qs371_atkinson_index", "atkinson", 0.0, 1.0),
    # Gibbs' inequality: KL >= 0 (full support via add-1 smoothing)
    ("qs372_source_kl_matrix", "kl_nats", 0.0, None),
    ("qs373_adjusted_rand", "ari", None, 1.0),
    ("qs374_fowlkes_mallows", "fm", 0.0, 1.0),
    ("qs374_fowlkes_mallows", "rand_index", 0.0, 1.0),
    ("qs375_hosmer_lemeshow", "hl_chi2", 0.0, None),
    ("qs376_youden_threshold", "tpr", 0.0, 1.0),
    ("qs376_youden_threshold", "fpr", 0.0, 1.0),
    ("qs376_youden_threshold", "j", -1.0, 1.0),
    ("qs378_theil_decomposition", "t_total", 0.0, None),
    ("qs378_theil_decomposition", "t_within", 0.0, None),
    ("qs378_theil_decomposition", "t_between", 0.0, None),
    # top quintile of the sorted deciles >= bottom quintile
    ("qs379_quintile_shares", "s80_s20", 1.0, None),
    ("qs379_quintile_shares", "palma", 0.0, None),
    ("qs380_gwet_ac1", "pa", 0.0, 1.0),
    ("qs380_gwet_ac1", "gwet_ac1", None, 1.0),
    ("qs383_somers_d", "d_yx", -1.0, 1.0),
    ("qs383_somers_d", "d_xy", -1.0, 1.0),
    ("qs384_stuart_tau_c", "tau_c", -1.0, 1.0),
    ("qs385_scott_pi", "po", 0.0, 1.0),
    ("qs385_scott_pi", "scott_pi", None, 1.0),
    ("qs386_yule_q", "yule_q", -1.0, 1.0),
    ("qs386_yule_q", "odds_ratio", 0.0, None),
    ("qs389_mrr_eval", "mrr_e6", 0, 1_000_000),
    ("qs390_kpss", "kpss_stat", 0.0, None),
    ("qs391_wasserstein", "w1_dollars", 0.0, None),
    ("qs392_lorenz_asymmetry", "lorenz_asymmetry", 0.0, 2.0),
    ("qs393_mrr_prefix_shortlist", "mrr_e6", 0, 1_000_000),
    ("qs394_kuiper", "kuiper_e6", 0, 2_000_000),
    ("qs394_kuiper", "dplus_num", 0, None),
    ("qs394_kuiper", "dminus_num", 0, None),
    ("qs395_anderson_darling", "a2", 0.0, None),
    ("qs396_brunner_munzel", "p_hat_e6", 0, 1_000_000),
    ("qs397_lepage", "lepage_l", 0.0, None),
    ("qs398_g_test", "g_stat", 0.0, None),
    ("qs399_cramers_v", "phi2", 0.0, None),
    ("qs399_cramers_v", "cramers_v", 0.0, 1.0),
    # Moran's I on a chain lies within the extreme eigenvalues of the
    # row-standardized weight matrix — comfortably inside [-1.5, 1.5]
    # for any n; the classic approximate range.
    ("qs401_moran_i_daily", "moran_i", -1.5, 1.5),
    ("qs402_embedding_simhash_recall", "recall_e6", 0, 1_000_000),
    ("qs402_embedding_simhash_recall", "hits_at_10", 0, 10),
    ("qs403_krippendorff_alpha", "d_o", 0.0, 1.0),
    ("qs403_krippendorff_alpha", "d_e", 0.0, 1.0 + 1e-6),
    ("qs403_krippendorff_alpha", "krippendorff_alpha", None, 1.0),
    ("qs404_chao1_vocab", "chao1", 0.0, None),
    ("qs405_rayleigh_weekday", "rbar", 0.0, 1.0),
    ("qs405_rayleigh_weekday", "rayleigh_z", 0.0, None),
]


@pytest.mark.parametrize(
    "name",
    sorted({q for q, _c, _l, _h in BOUNDS}),
)
def test_bounded_statistics_stay_in_range(spark, sf_dir, name):
    pdf = QUERIES[name](spark, sf_dir).toPandas()
    for q, col, lo, hi in BOUNDS:
        if q != name:
            continue
        vals = pd.to_numeric(pdf[col], errors="raise").dropna()
        if lo is not None:
            bad = vals[vals < lo]
            assert bad.empty, f"{name}.{col} below {lo}: {bad.tolist()[:5]}"
        if hi is not None:
            bad = vals[vals > hi]
            assert bad.empty, f"{name}.{col} above {hi}: {bad.tolist()[:5]}"
