"""Physical-plan shape tests: the plan properties that matter at 100 TB
must hold and stay held — filters/projections reaching the parquet
scan, dimension joins broadcasting (never shuffling the fact side for a
25-row dim), top-k compiling to TakeOrderedAndProject (per-partition k,
no global sort), and aggregations running partial+final (map-side
combine) rather than shuffling raw rows.

Plan-string assertions (operator names, Exchange counts) were validated
on Spark 4.1.x with AQE on; they encode the shapes we *want*, so on a
Spark upgrade a failure here means "re-audit the plan", not necessarily
"the code regressed". Exact-count assertions are upper bounds for that
reason."""

import pytest

from cds_etl_spark.plans import QUERIES


def plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    p = plan(spark, sf_dir, "qs01_scan_filter_project")
    # Predicate reaches the parquet reader…
    assert "PushedFilters" in p and "l_discount" in p.split("PushedFilters")[1][:200]
    # …and the scan schema is pruned to the referenced columns only.
    read_schema = p.split("ReadSchema")[1]
    assert "l_tax" not in read_schema and "l_comment" not in read_schema


def test_dimension_join_broadcasts(spark, sf_dir):
    p = plan(spark, sf_dir, "qs03_broadcast_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_topk_is_take_ordered(spark, sf_dir):
    # Global ORDER BY + LIMIT must not materialize a full sort.
    p = plan(spark, sf_dir, "qs25_global_topk")
    assert "TakeOrderedAndProject" in p
    p2 = plan(spark, sf_dir, "qs52_cosine_topk")
    assert "TakeOrderedAndProject" in p2


def test_range_join_pushes_band_predicate(spark, sf_dir):
    p = plan(spark, sf_dir, "qs08_range_join")
    pushed = p.split("PushedFilters")
    assert any("value" in seg[:250] for seg in pushed[1:]), (
        "band predicate e.value BETWEEN 10 AND 20 should reach the events scan"
    )


def test_aggregation_is_partial_final(spark, sf_dir):
    p = plan(spark, sf_dir, "qs10_groupby_agg_tpch_q1")
    assert p.count("HashAggregate") >= 2, "expected map-side partial aggregation"
    assert p.count("Exchange") == 1, "one shuffle (by group keys) and only one"


def test_semi_anti_joins_compile_to_joins(spark, sf_dir):
    p5 = plan(spark, sf_dir, "qs05_semi_join")
    p6 = plan(spark, sf_dir, "qs06_anti_join")
    assert "LeftSemi" in p5 or "Semi" in p5
    assert "LeftAnti" in p6 or "Anti" in p6
    assert "CartesianProduct" not in p5 and "CartesianProduct" not in p6


def test_exact_dedup_shuffles_hashes_not_text(spark, sf_dir):
    # The md5 group key must be computed below the Exchange (map-side),
    # so the shuffle payload is the 32-char hash, never the document.
    p = plan(spark, sf_dir, "qs54_exact_dedup")
    assert p.count("Exchange") == 1
    pre_exchange = p.split("Exchange")[1]
    assert "md5" in pre_exchange


@pytest.mark.parametrize(
    "name",
    ["qs55_minhash_lsh_pairs", "qs60_document_profile", "qs56_simhash"],
)
def test_text_operators_have_no_python_udfs(spark, sf_dir, name):
    # The 100 TB design rule: signatures/profiles are JVM array
    # expressions; Python appears nowhere in these plans.
    p = plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_decontaminate_broadcasts_probe_side(spark, sf_dir):
    # The probe (benchmark) n-gram set must broadcast: the corpus side
    # is only ever shuffled for its own per-doc regroup, never for the
    # match.
    p = plan(spark, sf_dir, "qs83_decontaminate")
    assert "BroadcastHashJoin" in p


def test_bm25_broadcasts_corpus_stats(spark, sf_dir):
    # N/avgdl (1 row) and per-term df (|terms| rows) attach by
    # broadcast — a sort-merge join against either would shuffle the
    # corpus once per statistic.
    p = plan(spark, sf_dir, "qs84_bm25")
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in p


def test_packing_shuffles_once_on_shard_key(spark, sf_dir):
    # One window over the shard partitioning; the explode adds no
    # exchange.
    p = plan(spark, sf_dir, "qs82_sequence_packing")
    assert p.count("Exchange") == 1


def test_forward_fill_is_single_window_pass(spark, sf_dir):
    p = plan(spark, sf_dir, "qs92_forward_fill")
    assert p.count("Exchange") == 1  # one shuffle on user_id
    assert "Window" in p


def test_segment_dedup_blocklist_is_broadcast_anti(spark, sf_dir):
    p = plan(spark, sf_dir, "qs111_segment_dedup")
    # the Zipf-head blocklist must broadcast; the exploded corpus side
    # of the filter must not shuffle through a sort-merge anti join
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_cms_build_aggregates_partial_final(spark, sf_dir):
    p = plan(spark, sf_dir, "qs110_cms_sketch")
    # map-side combine collapses each partition to ≤ depth·width rows
    # before the exchange — the property that makes the sketch shuffle
    # O(1) in input size
    assert p.count("HashAggregate") >= 2
    assert "CartesianProduct" not in p


def test_merge_upsert_is_one_join_no_python(spark, sf_dir):
    p = plan(spark, sf_dir, "qs107_merge_upsert")
    # MERGE compiles to a single full-outer join + codegen'd CASEs
    assert "FullOuter" in p or "full_outer" in p.lower()
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p


def test_tpch_q18_broadcasts_customer(spark, sf_dir):
    p = plan(spark, sf_dir, "qs109_tpch_q18")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_triangle_count_has_no_cartesian(spark, sf_dir):
    p = plan(spark, sf_dir, "qs108_triangle_count")
    # wedge build and closure probe are equi-joins on node keys; the
    # degree orientation must never degrade to an unconstrained product
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_q7_q10_broadcast_dims_and_topk(spark, sf_dir):
    # Nation dims (25 rows) must broadcast in both plans; Q10's top-20
    # must compile to TakeOrderedAndProject, never a global sort.
    p7 = plan(spark, sf_dir, "qs117_tpch_q7")
    assert p7.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p7
    p10 = plan(spark, sf_dir, "qs118_tpch_q10")
    assert "TakeOrderedAndProject" in p10
    assert "BroadcastHashJoin" in p10


def test_bigram_lm_model_joins_stay_narrow(spark, sf_dir):
    # Bigram construction is row-local (no window); the vocab-size
    # one-row aggregate attaches by broadcast, not a shuffle join.
    p = plan(spark, sf_dir, "qs119_bigram_lm")
    assert "Window" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pareto_frontier_has_no_all_pairs_join(spark, sf_dir):
    # The skyline plan is the window formulation: no self-join of part
    # against part (the NOT EXISTS oracle shape would be quadratic).
    p = plan(spark, sf_dir, "qs121_pareto_frontier")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # frontier pairs broadcast back
    assert "Window" in p


def test_minhash_signature_surface_is_scan_fused(spark, sf_dir):
    # Signature emission is a pure projection: zero planner exchanges,
    # zero Python — the index build never shuffles the corpus.  The one
    # allowed exchange is the scan-spread repartition (skew.spread_scan,
    # REPARTITION_BY_NUM), which only exists when the fixture scan has
    # fewer splits than cores and sits at the scan itself.
    import re

    p = plan(spark, sf_dir, "qs122_minhash_signatures")
    planner_ex = [
        ln
        for ln in re.findall(r"Exchange [^\n]*", p)
        if "REPARTITION_BY_NUM" not in ln
    ]
    assert not planner_ex, planner_ex
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_quality_filter_chain_is_zero_shuffle(spark, sf_dir):
    # The corpus filter is one scan-fused pass: no exchange anywhere.
    p = plan(spark, sf_dir, "qs124_quality_filter")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_event_transitions_single_user_shuffle(spark, sf_dir):
    # One keyed shuffle for the per-user ordering window; the 5x5
    # transition aggregation adds at most narrow exchanges after it.
    p = plan(spark, sf_dir, "qs123_event_transitions")
    assert "Window" in p
    assert p.count("Exchange") <= 3


def test_exists_compiles_to_semi_join(spark, sf_dir):
    # qs125 (TPC-H Q4): EXISTS must run as a LEFT SEMI broadcast/hash
    # join — never duplicating the orders side per matching lineitem.
    p = plan(spark, sf_dir, "qs125_tpch_q4_exists")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    # qs128 (TPC-H Q19): the OR-of-ANDs must split — part-only
    # conjuncts (brand/size) below the join on the part scan, the
    # quantity disjunction on the lineitem scan — so the join probes
    # pre-filtered inputs instead of filtering post-join.
    p = plan(spark, sf_dir, "qs128_tpch_q19_disjunctive")
    li_scan = [
        ln for ln in p.splitlines()
        if "FileScan" in ln and "l_quantity" in ln
    ]
    part_scan = [
        ln for ln in p.splitlines()
        if "FileScan" in ln and "p_brand" in ln
    ]
    assert li_scan and "l_quantity" in li_scan[0].split("DataFilters")[-1]
    assert part_scan and "p_brand" in part_scan[0].split("DataFilters")[-1]
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_q22_anti_join_with_broadcast_threshold(spark, sf_dir):
    # qs129 (TPC-H Q22): NOT EXISTS as LEFT ANTI; the one-row stats
    # aggregate broadcasts (no shuffled join for the threshold).
    p = plan(spark, sf_dir, "qs129_tpch_q22_antijoin")
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_q21_decorrelates_to_semi_and_anti(spark, sf_dir):
    # qs132 (TPC-H Q21): both correlated subqueries must run as
    # semi/anti hash joins co-keyed on l_orderkey — never per-row
    # probes or a cartesian. Top-20 stays TakeOrderedAndProject.
    p = plan(spark, sf_dir, "qs132_tpch_q21_sole_fault")
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_scalar_threshold_aggregates_broadcast(spark, sf_dir):
    # qs130/qs133: the one-row MAX/total attaches by broadcast — the
    # group aggregate is never re-shuffled to meet its own scalar.
    for name in ("qs130_tpch_q15_top_supplier", "qs133_tpch_q11_heavy_parts"):
        p = plan(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name


def test_qs31_rewrite_precondition_no_newlines(spark, sf_dir):
    # qs31's substring-conjunction plan equals the oracle regex ONLY
    # for newline-free text (`.` excludes \n in both engines). Guard
    # the precondition on the corpus the differential runs against.
    from cds_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    assert d.filter(F.col("text").contains("\n")).count() == 0


def test_qs135_qs136_oracle_series_bound_precondition(spark, sf_dir):
    # ADVICE r5: qs135's and qs136's oracles enumerate window/chunk
    # positions from a hard-coded range(1, 100000) while the Spark
    # side is unbounded — a document with >= ~100k tokens would
    # silently diverge the differential. Guard the corpus precondition
    # the same way test_qs31_rewrite_precondition_no_newlines does:
    # assert max token count is well under the bound (10x headroom for
    # qs135's positions; qs136 consumes ~1/96th of the series, so the
    # same guard gives it ~960x).
    from cds_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    max_toks = d.agg(
        F.max(F.size(F.split(F.col("text"), " "))).alias("m")
    ).collect()[0]["m"]
    assert max_toks < 10_000, (
        f"documents corpus has a {max_toks}-token doc; qs135/qs136 "
        "oracles cap position series at 100000 — raise the bound"
    )


def test_heavy_hitters_sketch_and_candidates_broadcast(spark, sf_dir):
    # qs137: the depth*width sketch and the pruned candidate set must
    # both broadcast — the exploded token stream shuffles only for its
    # own per-token aggregation, never for the sketch probe.
    p = plan(spark, sf_dir, "qs137_sketch_heavy_hitters")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "LeftSemi" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_rowlocal_repetition_is_zero_shuffle(spark, sf_dir):
    # qs138: the whole point of the alternative physics — the bigram
    # multiset counts inside the row, so the plan has NO exchange
    # (qs89's formulation shuffles twice for the same values).
    p = plan(spark, sf_dir, "qs138_repetition_rowlocal")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_rowlocal_repetition_gate_matches_n_grams(spark):
    # qs138's cheap pre-filter `size(split(lower(text),' ')) >= 2` must
    # stay exactly equivalent to `n_grams > 0` from
    # bigram_repetition_stats — a tokenizer change in functions/text.py
    # would silently desynchronize the gate (ADVICE r15 item 1).
    from pyspark.sql import functions as F

    from cds_etl_spark.functions.text import bigram_repetition_stats

    rows = [
        (1, None),
        (2, ""),
        (3, "one"),
        (4, "two tokens"),
        (5, "a b c"),
        (6, "trailing space "),
        (7, " leading"),
        (8, "  "),
        (9, "double  space"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = (
        df.select(
            "id",
            bigram_repetition_stats(F.col("text")).alias("_s"),
            (F.size(F.split(F.lower(F.col("text")), " ")) >= 2).alias("gate"),
        )
        .select("id", (F.col("_s.n_grams") > 0).alias("ref"), "gate")
        .collect()
    )
    for r in got:
        assert bool(r["gate"] or False) == bool(r["ref"] or False), (
            f"id={r['id']}: gate={r['gate']} but n_grams>0={r['ref']}"
        )


def test_q13_outer_join_survives_and_q8_broadcasts_snowflake(spark, sf_dir):
    # qs139: the left OUTER join must survive to the physical plan
    # (a WHERE-placed filter would have turned it inner and dropped
    # zero-order customers).
    p13 = plan(spark, sf_dir, "qs139_tpch_q13_custdist")
    assert "LeftOuter" in p13 or "left_outer" in p13.lower()
    # qs140: five dimension joins, every one broadcast; only the
    # lineitem-orders fact edge may shuffle.
    p8 = plan(spark, sf_dir, "qs140_tpch_q8_market_share")
    assert p8.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in p8


def test_q6_all_three_predicates_push_to_scan(spark, sf_dir):
    # qs141 (TPC-H Q6): scan-dominated — shipdate, discount AND
    # quantity must all reach the parquet reader for row-group pruning.
    p = plan(spark, sf_dir, "qs141_tpch_q6_forecast")
    pushed = p.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_qs142_single_doc_exchange_shared_by_windows_and_aggs(spark, sf_dir):
    # qs142's claim (r15 single-pass form): one pinned h exchange feeds
    # the duplication window, then ONE doc-keyed exchange feeds both
    # window steps AND the island/doc aggregations; the doc-length side
    # joins as a broadcast, never SMJ.  The scan-spread repartition
    # (skew.spread_scan, REPARTITION_BY_NUM) is the only other allowed
    # doc-keyed exchange — it sits at the scan, not between the window
    # and the aggregations.
    import re

    p = plan(spark, sf_dir, "qs142_duplicate_span_coverage")
    lines = re.findall(r"Exchange hashpartitioning\([^\n]*", p)
    keys = [ln.split("(", 1)[1] for ln in lines]
    ensure = [
        ln.split("(", 1)[1] for ln in lines if "REPARTITION_BY_NUM" not in ln
    ]
    assert len(ensure) <= 3, f"expected <=3 planner hash exchanges: {keys}"
    # exactly ONE planner-inserted doc-only exchange: both windows, the
    # island agg and the doc agg all ride it (a second one would mean
    # the window partitioning was not reused).
    doc_only = [k for k in ensure if k.startswith("doc_id") and "h#" not in k]
    assert len(doc_only) == 1, keys
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Window") >= 2


def test_qs143_register_build_is_bounded_single_shuffle(spark, sf_dir):
    # hll_build: explode is row-local; ONE shuffle on (group, idx) with
    # map-side partial max — at scale each map task emits at most
    # groups x 256 rows.
    import re

    p = plan(spark, sf_dir, "qs143_hll_register_table")
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert p.count("HashAggregate") >= 2  # partial + final


def test_partsupp_extras_plan_shapes(spark, tmp_path_factory):
    # Q9: all dims broadcast, fact joins keyed; Q20: lineitem aggregated
    # BEFORE joining partsupp (the shuffle carries (part,supp,qty) only)
    # and the supplier probe is a semi join.
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from gen_sf import generate

    from cds_etl_spark.plans.tpch_extras import (
        q9_product_type_profit,
        q20_potential_promotion,
    )

    d = str(tmp_path_factory.mktemp("ps_plans") / "sf0.001")
    generate(0.001, d)

    p9 = q9_product_type_profit(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p9 and "CartesianProduct" not in p9

    p20 = q20_potential_promotion(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p20 and "CartesianProduct" not in p20
    # the lineitem aggregation (partial+final over l_partkey,l_suppkey)
    # appears below the partsupp join, i.e. pre-aggregation survived.
    assert p20.count("HashAggregate") >= 2


def test_gen_sf_zipf_vocab_option(tmp_path_factory):
    """r14 fixture option (VERDICT r13 task 1): doc_vocab='zipf' must
    (a) leave every non-documents table byte-identical to the flat
    run — the option draws from a dedicated rng stream after
    consuming the flat draw, so existing gen-fixture evidence stays
    valid; (b) produce a long-tailed vocabulary with genuinely rare
    tokens (the flat 36-word VOCAB's min df is ~58% of the corpus,
    which makes the qs393 prefix filter unable to prune)."""
    import os
    import sys
    from collections import Counter

    import pyarrow.parquet as pq

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from gen_sf import generate

    root = tmp_path_factory.mktemp("genzipf")
    flat, zipf = str(root / "flat"), str(root / "zipf")
    generate(0.002, flat)
    generate(0.002, zipf, doc_vocab="zipf")

    for t in ("orders", "lineitem", "events", "embeddings", "partsupp"):
        a = open(os.path.join(flat, f"{t}.parquet"), "rb").read()
        b = open(os.path.join(zipf, f"{t}.parquet"), "rb").read()
        assert a == b, f"{t} perturbed by doc_vocab option"

    def dfreq(d):
        texts = pq.read_table(
            os.path.join(d, "documents.parquet"), columns=["text"]
        )["text"].to_pylist()
        c = Counter()
        for t in texts:
            c.update(set(t.split(" ")))
        return c, len(texts)

    fc, n = dfreq(flat)
    zc, _ = dfreq(zipf)
    # Flat: every token is everywhere; zipf: a real rare tail exists.
    assert min(fc.values()) > n * 0.3
    assert min(zc.values()) <= 2
    assert len(zc) > 10 * len(fc)

    import pytest

    with pytest.raises(ValueError, match="flat.*zipf|zipf.*flat"):
        generate(0.002, str(root / "bad"), doc_vocab="Zipf")


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """Spark's runtime row-level bloom filter (SPARK-32268): with a
    selective filter on the small join side, the optimizer injects a
    bloom_filter_agg on the build side and a might_contain probe
    into the big side's scan — rows that cannot match are dropped
    BEFORE the shuffle. At 100 TB this activates by itself (the
    application-side threshold defaults to 10 GB); here the
    thresholds are lowered to make the injection observable at test
    scale. This is evidence the engine's sessions leave the feature
    reachable, plus documentation of the knobs that govern it."""
    from pyspark.sql import functions as F

    from cds_etl_spark.catalog import load_table

    knobs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in knobs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        # And the filtered result is still right.
        assert j.count() == 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
