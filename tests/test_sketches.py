"""HLL distinct sketches (operators/text_analysis.distinct_sketch_by):
accuracy vs exact, and lossless partial-sketch union."""

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.text_analysis import distinct_sketch_by


def test_estimate_within_hll_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["estimate"]
        for r in distinct_sketch_by(li, "l_returnflag", "l_orderkey").collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) / want[k] < 0.05  # lg_k=12 -> ~1.6% rse


def test_partial_sketches_union_to_full_estimate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "half", (F.col("l_orderkey") % 2)
    )
    partial = li.groupBy("half").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(12)).alias("sk")
    )
    merged = partial.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    full = li.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("l_orderkey", F.lit(12))
        ).alias("est")
    ).first()["est"]
    # Union of partials matches the full-pass estimate to sketch
    # accuracy (representation mode can differ between the two paths,
    # so bit-equality is not guaranteed).
    exact = li.select("l_orderkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05
    assert abs(merged - full) / full < 0.01


# ------------------------------------------------------- Count-Min sketch


def _terms(spark, sf_dir):
    from pyspark.sql import functions as F

    from cds_etl_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")


def test_cms_estimate_upper_bounds_true_count(spark, sf_dir):
    from pyspark.sql import functions as F

    from cds_etl_spark.operators.sketches import cms_build, cms_estimate

    terms = _terms(spark, sf_dir).localCheckpoint(eager=True)
    sketch = cms_build(terms, "term", depth=4, width=256)
    truth = {
        r["term"]: r["n"]
        for r in terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(truth.values())
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(sketch, terms, "term", depth=4, width=256).collect()
    }
    assert set(est) == set(truth)
    # CMS never under-counts; over-count bounded by eps*N (eps ~ 2/width)
    # for the vast majority of keys — assert the hard lower bound per key
    # and the expected-error bound on average.
    assert all(est[t] >= truth[t] for t in truth)
    avg_err = sum(est[t] - truth[t] for t in truth) / len(truth)
    assert avg_err <= (2.0 / 256) * n_total


def test_cms_merge_equals_build_on_union(spark, sf_dir):
    from pyspark.sql import functions as F

    from cds_etl_spark.operators.sketches import cms_build, cms_merge

    terms = _terms(spark, sf_dir).localCheckpoint(eager=True)
    left = terms.filter(F.length("term") <= 4)
    right = terms.filter(F.length("term") > 4)
    merged = cms_merge(
        cms_build(left, "term", depth=4, width=64),
        cms_build(right, "term", depth=4, width=64),
    )
    full = cms_build(terms, "term", depth=4, width=64)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b


def test_cms_estimate_absent_item_is_zero_or_collision(spark, sf_dir):
    from cds_etl_spark.operators.sketches import cms_build, cms_estimate

    terms = _terms(spark, sf_dir)
    sketch = cms_build(terms, "term", depth=4, width=256)
    probe = spark.createDataFrame(
        [("zzzz-not-in-corpus-1",), ("zzzz-not-in-corpus-2",)], "term string"
    )
    est = {r["term"]: r["est"] for r in
           cms_estimate(sketch, probe, "term", depth=4, width=256).collect()}
    # absent items may collide but estimates stay small and non-negative
    assert all(v >= 0 for v in est.values()) and len(est) == 2


def test_cms_build_weighted_doubles_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from cds_etl_spark.operators.sketches import cms_build

    terms = _terms(spark, sf_dir).withColumn("w", F.lit(2)).localCheckpoint(eager=True)
    plain = cms_build(terms, "term", depth=2, width=32)
    weighted = cms_build(terms, "term", depth=2, width=32, weight_col="w")
    joined = {
        (r["j"], r["bucket"]): (r["cnt"], r["wcnt"])
        for r in plain.join(
            weighted.withColumnRenamed("cnt", "wcnt"), ["j", "bucket"]
        ).collect()
    }
    assert joined and all(w == 2 * c for c, w in joined.values())


def test_hll_portable_accuracy(spark, sf_dir):
    """Portable-HLL estimate within HLL error bounds of the exact
    distinct count (m=1024 -> sigma ~3.25%; assert 4 sigma)."""
    from cds_etl_spark.operators.sketches import hll_distinct_by

    li = load_table(spark, sf_dir, "lineitem")
    est = {
        r["l_returnflag"]: r["estimate"]
        for r in hll_distinct_by(li, "l_returnflag", "l_orderkey").collect()
    }
    exact = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, d in exact.items():
        assert abs(est[flag] - d) <= max(4 * 0.0325 * d, 8.0), (
            flag, est[flag], d
        )


def test_hll_portable_merge_equals_single_pass(spark, sf_dir):
    """Sharded build + max-merge yields byte-identical registers (and
    hence the identical estimate) to a single-pass build — the
    incremental-maintenance contract."""
    from cds_etl_spark.operators.sketches import (
        hll_build,
        hll_distinct_by,
        hll_estimate,
        hll_merge,
    )

    li = load_table(spark, sf_dir, "lineitem")
    a = hll_build(li.filter(F.col("l_orderkey") % 2 == 0), "l_returnflag", "l_orderkey")
    b = hll_build(li.filter(F.col("l_orderkey") % 2 == 1), "l_returnflag", "l_orderkey")
    merged = hll_estimate(hll_merge(a, b), "l_returnflag")
    single = hll_distinct_by(li, "l_returnflag", "l_orderkey")
    m = sorted(map(tuple, merged.collect()))
    s = sorted(map(tuple, single.collect()))
    assert m == s


def test_hll_oracle_sql_matches_spark(spark, duck, sf_dir):
    """hll_oracle_sql is generated from the same constants as the
    Spark plan; assert exact estimate equality against DuckDB on a
    second (group, value) pair to guard the shared-constants contract
    beyond what qs90's differential already covers."""
    from cds_etl_spark.operators.sketches import hll_distinct_by, hll_oracle_sql

    o = load_table(spark, sf_dir, "orders")
    got = sorted(
        map(tuple, hll_distinct_by(o, "o_orderstatus", "o_custkey", p=8).collect())
    )
    want = sorted(
        map(tuple, duck.sql(hll_oracle_sql("orders", "o_orderstatus", "o_custkey", p=8)).fetchall())
    )
    assert got == want
