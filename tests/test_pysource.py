"""Custom Python DataSource (sources/pysource.py, Spark 4 API).

Contracts: partition planning controls parallelism; rows are
deterministic and worker-independent; EqualTo on event_type pushes
down INTO the reader (verified at both the unit and the plan-result
level); the streaming face replays identically between offsets.
"""

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, InputPartition

from cds_etl_spark.sources.pysource import (
    SyntheticEventsDataSource,
    _SynthReader,
    synth_row,
)


def _register(spark):
    # Runtime-settable; get_spark sets it by default — vanilla
    # sessions (like the shared test one) opt in here.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_deterministic_and_partitioned(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = sorted(
        (r["event_id"], r["event_type"], r["value"], r["part"])
        for r in df.collect()
    )
    expected = sorted(
        (*synth_row(i), i % 5) for i in range(100)
    )
    assert rows == expected
    # Second read: identical (no RNG state anywhere).
    again = sorted(
        (r["event_id"], r["event_type"], r["value"], r["part"])
        for r in df.collect()
    )
    assert again == rows


def test_filter_pushdown_into_reader(spark):
    # Unit level: the reader absorbs the EqualTo and returns the rest
    # as unsupported.
    r = _SynthReader({"n_rows": "40", "partitions": "2"})
    rest = list(
        r.pushFilters(
            [EqualTo(("event_type",), "click"), GreaterThan(("value",), 10.0)]
        )
    )
    assert r.type_filter == "click"
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
    generated = list(r.read(InputPartition(0))) + list(
        r.read(InputPartition(1))
    )
    assert generated and all(t == "click" for _, t, _v, _p in generated)
    # End to end: result equals the python-side recompute.
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 200)
        .option("partitions", 4)
        .load()
        .filter(F.col("event_type") == "purchase")
    )
    got = sorted(r["event_id"] for r in df.collect())
    want = sorted(
        i for i in range(200) if synth_row(i)[1] == "purchase"
    )
    assert got == want


def test_stream_reader_batches_and_replay(spark, tmp_path):
    _register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 7)
        .load()
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    rows = sorted(
        (r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(out).collect()
    )
    # At least one 7-row batch, rows are exactly the deterministic
    # prefix (offsets advance 7 at a time from 0).
    assert len(rows) >= 7 and len(rows) % 7 == 0
    assert rows == sorted(synth_row(i) for i in range(len(rows)))
    # Replay between offsets is identical (the exactly-once property).
    from cds_etl_spark.sources.pysource import _SynthStreamReader

    sr = _SynthStreamReader({"rows_per_batch": "7"})
    assert sr.readBetweenOffsets({"i": 3}, {"i": 9}) == [
        (*synth_row(i), 0) for i in range(3, 9)
    ]


def test_commitlog_format_write_read_time_travel(spark, tmp_path):
    from cds_etl_spark.sources.commitlog import (
        latest_version,
        read_snapshot,
        vacuum,
    )
    from cds_etl_spark.sources.pysource import CommitlogDataSource

    spark.dataSource.register(CommitlogDataSource)
    t = str(tmp_path / "tbl")
    df1 = spark.range(0, 10).withColumnRenamed("id", "k")
    df2 = spark.range(10, 15).withColumnRenamed("id", "k")
    df1.write.format("commitlog").mode("append").save(t)
    df2.write.format("commitlog").mode("append").save(t)
    assert latest_version(spark, t) == 1
    # Both read paths see the atomic snapshots, including time travel.
    via_format = sorted(
        r["k"]
        for r in spark.read.format("commitlog").load(t).collect()
    )
    assert via_format == list(range(15))
    assert sorted(
        r["k"] for r in read_snapshot(spark, t).collect()
    ) == list(range(15))
    v0 = sorted(
        r["k"]
        for r in spark.read.format("commitlog")
        .option("version", 0)
        .load(t)
        .collect()
    )
    assert v0 == list(range(10))
    # Overwrite via the format, then vacuum: the writer's manifests
    # must use the same qualified paths as the Hadoop-side commits,
    # or vacuum would eat live files.
    spark.range(100, 103).withColumnRenamed("id", "k").write.format(
        "commitlog"
    ).mode("overwrite").save(t)
    vacuum(spark, t, keep_last=1, retention_s=0)
    assert sorted(
        r["k"] for r in read_snapshot(spark, t).collect()
    ) == [100, 101, 102]
    assert sorted(
        r["k"]
        for r in spark.read.format("commitlog").load(t).collect()
    ) == [100, 101, 102]
