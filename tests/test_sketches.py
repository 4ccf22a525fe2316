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
