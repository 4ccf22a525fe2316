"""Physical-plan shape snapshots — the regression guard for "the plan
you'd want".

A correctness suite cannot notice a lost broadcast, a vanished
partial aggregate, or a new Exchange: the answers stay right while
the 100 TB plan silently degrades. This tool freezes the NORMALIZED
physical-plan shape (node names + tree structure; expression ids,
codegen stage numbers, paths, and statistics stripped) of a
representative query set into a golden file, and
``tests/test_plan_shapes.py`` fails when any shape drifts — plan
changes become explicit, reviewed diffs instead of accidents.

Update after an INTENTIONAL plan change:

    python tools/plan_snapshot.py --update

The snapshot uses a plain vanilla session over raw sf0.01 testdata
(no engine confs, no bucketed warehouse) so it captures the
optimizer's unaided behavior — the same environment as the driver's
correctness runs.
"""

from __future__ import annotations

import os
import re
import sys

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "tests",
    "golden",
    "plan_shapes.txt",
)

# Representative shapes: every bench headline + one per join/window/
# sketch/graph-adjacent physics family added since.
SNAPSHOT_QUERIES = [
    "qs01_scan_filter_project",
    "qs03_broadcast_join",
    "qs10_groupby_agg_tpch_q1",
    "qs14_combine_rows_string_agg",
    "qs20_topk_per_group",
    "qs31_regex_filter",
    "qs41_distinct",
    "qs100_tpch_q3",
    "qs140_tpch_q8_market_share",
    "qs167_zscore_anomaly",
    "qs171_cms_join_size",
    "qs180_clamped_balance",
    # r6 session-4 structural plans: the repartition-before-expansion
    # grid join, the broadcast-dim share window, and the two-stage
    # window+join decomposition.
    "qs206_grid_spatial_pairs",
    "qs211_herfindahl_index",
    "qs209_seasonal_decompose",
    # r7 structural plans: the value-level midrank join (no global
    # sort), the bounded-basket 3-way self-join, the broadcast-dim
    # elasticity aggregate, and the two-half-iteration HITS joins.
    "qs243_spearman_corr",
    "qs256_frequent_triples",
    "qs251_price_elasticity",
    "qs260_hits_scores",
    # r7 stats-test plans: the log-rank risk-set grid (cross of a
    # 2-row Range with the day spine, cumulative window per group)
    # and the JS-divergence shared-term join with broadcast per-source
    # entropy epilogue.
    "qs269_logrank_test",
    "qs274_js_divergence",
    # r12 structural plans: the two-segment pooled rank window (no
    # broadcast hints on the corpus-proportional join), the exact
    # KPSS month-grid cumsum/lag pass, and the merged value-grid
    # Wasserstein CDF window.
    "qs387_ansari_bradley",
    "qs390_kpss",
    "qs391_wasserstein",
    # r7 session-2 structural plans: the one-row exact-moment pivot
    # epilogue (CUPED), the boundary-broadcast multi-ntile (RFM),
    # and the multi-weight bucketed prefix sum (Jonckheere).
    "qs275_cuped_lift",
    "qs210_rfm_segments",
    "qs298_jonckheere_trend",
    # r8 structural plans: the clique-identity assortativity collapse
    # (block-size aggregate instead of the O(Σk²) edge expansion),
    # the bucketed_row_number Gini total order, and the split-leakage
    # LSH×hash-split composition.
    "qs214_degree_assortativity",
    "qs307_gini_balances",
    "qs308_split_leakage",
    # r9 structural plan: the VaR/CVaR cumulative tail count on
    # bucketed_prefix_sum (kills the 5-task per-prio value-grid
    # window; cum_hi = tn - cum_lo + cnt).
    "qs230_var_cvar",
    # r9 ranking-family rewires: exact rank algebra on
    # bucketed_row_number replaces the single-task (qs21/qs71) and
    # 3-task (qs24) global-sort windows; qs105's per-source cap runs
    # on the salted two-level capped_row_number.
    "qs21_ranking_family",
    "qs71_rank_pct",
    "qs24_window_navigation",
    "qs105_cap_per_group",
    # r10 sorted-neighborhood rewires: explode+equi-join pairing
    # bounds pair/wedge volume linearly in the corpus (the r9
    # scale-killer fix) — freeze so a regression back to a block-wide
    # BroadcastNestedLoop/cartesian shape fails loudly.
    "qs334_adamic_adar",
    "qs341_shingle_containment",
    # r11 structural plans: the row-local bigram transform feeding a
    # gram-keyed count + per-source epilogue (boilerplate), the
    # vocab-grid dense-model self-join (source KL matrix), and the
    # one-aggregate four-conditional-distinct Heaps fit — freeze the
    # shapes so a corpus-shuffle regression (e.g. a per-doc window
    # sneaking into the bigram path) fails loudly.
    "qs360_boilerplate_ngrams",
    "qs372_source_kl_matrix",
    "qs366_heaps_law",
    # r15 structural plans (VERDICT r14 task 3): the newest heavy
    # families, frozen so a lost broadcast or new corpus shuffle
    # fails CI. qs393: prefix-filter MRR shortlist — the postings
    # join must stay bounded (412× candidate shrink vs exact qs389
    # measured on the zipf fixture, BASELINE r14). qs402: SimHash
    # shortlist — the zero-shuffle codegen signature scan feeding a
    # broadcast band probe (linear through sf100). The third r14
    # family, the persisted-index append's counts-sidecar merge, is
    # guarded by a no-bands-rescan plan assertion in
    # tests/test_dedup_banding.py (it needs an on-disk index, not a
    # registry query).
    "qs393_mrr_prefix_shortlist",
    "qs402_embedding_simhash_recall",
]


def normalized_plan(df) -> str:
    """Executed (pre-materialization AQE initial) physical plan,
    normalized to its stable shape: node names and nesting only —
    crucially INCLUDING Exchange nodes, so a new shuffle or a lost
    broadcast fails the snapshot."""
    raw = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in raw.splitlines():
        # Strip codegen stage markers and keep tree prefix + node name.
        line = re.sub(r"\*\(\d+\)\s*", "", line)
        m = re.match(r"^([ :+\-]*)([A-Za-z][A-Za-z0-9_]*)", line)
        if not m:
            continue
        prefix, node = m.groups()
        # Subtree continuation lines of a multi-line node repeat the
        # node name only on the first line; keep those only.
        out.append(f"{prefix}{node}")
    return "\n".join(out)


def build_snapshot(spark, sf_dir: str) -> str:
    from cds_etl_spark.plans import QUERIES

    parts = []
    for name in SNAPSHOT_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        parts.append(f"=== {name} ===\n{normalized_plan(df)}")
    return "\n\n".join(parts) + "\n"


def main() -> None:
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    snap = build_snapshot(spark, "/root/testdata/sf0.01")
    if "--update" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            fh.write(snap)
        print(f"wrote {GOLDEN} ({len(snap.splitlines())} lines)")
    else:
        print(snap)
    spark.stop()


if __name__ == "__main__":
    main()
