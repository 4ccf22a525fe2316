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


def test_eager_persist_populates_cache(spark):
    df = pin_stage(spark.range(50), "corpus", via="persist", eager=True)
    # populated at build: the cached relation reports its real size
    jdf = df._jdf.queryExecution().optimizedPlan()
    assert df.count() == 50
    df.unpersist()
    assert jdf is not None
