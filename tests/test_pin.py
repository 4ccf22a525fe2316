"""The size-aware stage-pin policy (operators/pin.py, r16):
bounded → localCheckpoint, corpus → cut_lineage (reliable checkpoint
when a dir is configured) or opt-in persist, iterative → cut_lineage.
"""

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.operators.pin import cut_lineage, pin_stage


def _is_rdd_scan(df):
    # a checkpointed DataFrame's plan truncates to a LogicalRDD scan
    return "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_bounded_localcheckpoints(spark):
    df = pin_stage(spark.range(10), "bounded")
    assert _is_rdd_scan(df)
    assert df.count() == 10


def test_corpus_default_cuts_lineage_locally(spark):
    # no checkpoint dir in the test session -> localCheckpoint
    assert spark.sparkContext.getCheckpointDir() is None
    df = pin_stage(spark.range(10), "corpus")
    assert _is_rdd_scan(df)
    assert df.count() == 10


def test_corpus_persist_keeps_lineage_and_caches(spark):
    df = pin_stage(
        spark.range(100).withColumn("s", F.col("id").cast("string")),
        "corpus",
        via="persist",
    )
    assert df.storageLevel.useMemory and df.storageLevel.useDisk
    # lineage intact: NOT a checkpoint-truncated plan — executor loss
    # recomputes from the original lineage
    assert not _is_rdd_scan(df)
    assert df.count() == 100
    df.unpersist()


def test_corpus_reliable_checkpoint_when_dir_set(spark, tmp_path):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    try:
        sc.setCheckpointDir(str(tmp_path / "ck"))
        df = cut_lineage(spark.range(10))
        # reliable checkpoint: materialized under the configured dir
        assert _is_rdd_scan(df)
        ckdir = tmp_path / "ck"
        files = [p for p in ckdir.rglob("*") if p.is_file()]
        assert files, "no checkpoint files written under the dir"
        assert df.count() == 10
    finally:
        # pyspark has no unset API; set the Scala var back to None
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
    assert sc.getCheckpointDir() is None


def test_scope_and_via_validation(spark):
    with pytest.raises(ValueError):
        pin_stage(spark.range(1), "huge")
    with pytest.raises(ValueError):
        pin_stage(spark.range(1), "bounded", via="persist")
    with pytest.raises(ValueError):
        pin_stage(spark.range(1), "corpus", via="cache")


def test_expansion_probe_pins_survive_aqe(spark, sf_dir):
    # VERDICT r15 task 6: qprof's x1task detector promoted to CI. The
    # expansion-probe exchanges of qs163/qs285/qs146/qs341 are pinned
    # to defaultParallelism-derived counts because AQE cannot see
    # post-join expansion: without the pin it coalesces the tiny
    # pre-expansion exchange to ONE task and the whole probe stage
    # runs serially (the r15 finding). Freeze two invariants against
    # Spark upgrades / conf drift: (1) at least one pinned
    # REPARTITION_BY_NUM exchange with the derived count survives to
    # the EXECUTED (AQE-final) plan; (2) no exchange in these plans is
    # re-read coalesced.
    from cds_etl_spark.plans import QUERIES

    npart = spark.sparkContext.defaultParallelism * 4
    # qs163's pins live inside build-time-executed checkpoint subtrees
    # (the final plan truncates at the checkpoint scans), so only
    # invariant (2) is checkable for it.
    for name, pin_visible in (
        ("qs163_prefix_filter_simjoin", False),
        ("qs285_clustering_coefficient", True),
        ("qs146_semantic_dedup", True),
        ("qs341_shingle_containment", True),
    ):
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        p = df._jdf.queryExecution().executedPlan().toString()
        if pin_visible:
            assert f", {npart}), REPARTITION_BY_NUM" in p, (
                f"{name}: pinned {npart}-partition exchange missing "
                "from the executed plan"
            )
        for ln in p.splitlines():
            assert not ("AQEShuffleRead" in ln and "coalesced" in ln), (
                f"{name}: a probe exchange was AQE-coalesced: {ln.strip()}"
            )


def test_eager_persist_populates_cache(spark):
    df = pin_stage(spark.range(50), "corpus", via="persist", eager=True)
    # populated at build: the cached relation reports its real size
    jdf = df._jdf.queryExecution().optimizedPlan()
    assert df.count() == 50
    df.unpersist()
    assert jdf is not None
