"""Streaming fault-injection soak (r10 verdict task 5).

The clean-run tests prove the sinks' exactly-once and the monitors'
epoch idempotence when nothing fails. This battery FORCES failures in
the worst windows — durable output written, checkpoint commit not yet
recorded — and on EVERY epoch's first attempt (the flaky-foreachBatch
model of task retries), then restarts until the stream drains and
asserts the recovered state is bit-identical to a clean run.

Retry model: Structured Streaming runs foreachBatch epochs serially;
a raise kills the query and the SAME epoch replays on restart from
the checkpoint. There is no speculative/concurrent re-execution of a
foreachBatch body within one query, so serial replay is the whole
fault surface these sinks must survive.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cds_etl_spark.sources.commitlog import (
    committed_epochs,
    latest_version,
    read_snapshot,
)
from cds_etl_spark.streaming.ops import (
    stream_commitlog_sink,
    stream_cusum_monitor,
    stream_heavy_hitters,
)


class _Boom(RuntimeError):
    pass


def _drain(run, max_restarts=16):
    """Restart ``run`` until the stream drains; count the restarts.

    Only the injected fault is swallowed — anything else propagates.
    Structured Streaming wraps the foreachBatch user exception, so
    detection is by message, not isinstance.
    """
    restarts = 0
    while True:
        try:
            run()
            return restarts
        except Exception as ex:  # noqa: BLE001
            if "boom-injected" not in str(ex):
                raise
            restarts += 1
            assert restarts <= max_restarts, "fault never cleared"


def _once_per_epoch(phase_to_fail=None):
    """A flaky fault: first attempt of EVERY epoch raises, replays
    succeed. ``phase_to_fail`` narrows to the commitlog sink's
    "pre"/"post" window; None means the single-phase monitor hooks."""
    seen: set = set()

    def fault(epoch_id, phase=None):
        if phase_to_fail is not None and phase != phase_to_fail:
            return
        if epoch_id not in seen:
            seen.add(epoch_id)
            raise _Boom(f"boom-injected epoch={epoch_id} phase={phase}")

    return fault


def _kv(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k long, v string"
    )


def _inbox(spark, tmp_path, name, batches):
    src = str(tmp_path / name)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    return src


@pytest.mark.parametrize("phase", ["pre", "post"])
def test_commitlog_sink_flaky_every_epoch(spark, tmp_path, phase):
    """Every epoch's FIRST attempt dies — before the commit publishes
    ("pre": replay must re-commit) or after it publishes but before
    the checkpoint records ("post": replay must SKIP via the epoch
    stamps). Either way the drained table is exact: no lost epochs,
    no duplicate rows, exactly one version per epoch."""
    n_epochs = 4
    src = _inbox(
        spark, tmp_path, f"cl_inbox_{phase}",
        [_kv(spark, 10 * i, 10 * (i + 1)) for i in range(n_epochs)],
    )
    t = str(tmp_path / f"cl_tbl_{phase}")
    ckpt = str(tmp_path / f"cl_ckpt_{phase}")
    fault = _once_per_epoch(phase_to_fail=phase)

    def run():
        stream = spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        stream_commitlog_sink(stream, t, ckpt, fault=fault)

    restarts = _drain(run)
    assert restarts == n_epochs  # each epoch really did fail once

    got = sorted(r["k"] for r in read_snapshot(spark, t).collect())
    assert got == list(range(10 * n_epochs))  # complete, no dupes
    assert latest_version(spark, t) == n_epochs - 1  # one commit/epoch
    assert committed_epochs(spark, t) == set(range(n_epochs))


def test_commitlog_sink_post_crash_window_is_real(spark, tmp_path):
    """Prove the injected window is the dangerous one: after a "post"
    crash the data IS committed while the checkpoint has NOT recorded
    the epoch — a non-idempotent sink would duplicate on replay."""
    src = _inbox(
        spark, tmp_path, "cl_inbox_win",
        [_kv(spark, 0, 10), _kv(spark, 10, 20)],
    )
    t = str(tmp_path / "cl_tbl_win")
    ckpt = str(tmp_path / "cl_ckpt_win")

    def crash_post_1(epoch_id, phase):
        if phase == "post" and epoch_id == 1:
            raise _Boom("boom-injected")

    def run():
        stream = spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        stream_commitlog_sink(stream, t, ckpt, fault=crash_post_1)

    with pytest.raises(Exception, match="boom-injected"):
        run()
    # Epoch 1's commit survived the crash...
    assert committed_epochs(spark, t) == {0, 1}
    # ...but its checkpoint commit is missing, so it WILL replay.
    commits = {
        f
        for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    }
    assert "1" not in commits

    run()  # clean restart: replay skips the committed epoch
    got = sorted(r["k"] for r in read_snapshot(spark, t).collect())
    assert got == list(range(20))
    assert latest_version(spark, t) == 1  # replay published NOTHING new


def _cusum_events(spark, n, shift=0.0, seed=0):
    rng = np.random.default_rng(seed)
    vals = np.clip(rng.uniform(0, 480, n) + shift, 0.0, 511.0)
    return spark.createDataFrame(
        [(i, "click", float(v)) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )


def test_cusum_monitor_flaky_every_epoch_matches_clean_run(
    spark, tmp_path
):
    """The CUSUM monitor chains state across epochs (epoch N reads
    its predecessor's partition), which is exactly where replay bugs
    corrupt accumulators: a replayed epoch that chained onto ITS OWN
    surviving partition would double-accumulate the shift. Fail every
    epoch's first attempt after its durable writes, drain, and require
    state + alarms identical to an untouched clean run."""
    from cds_etl_spark.operators.drift import build_anomaly_baseline

    bpath = str(tmp_path / "cu_base")
    build_anomaly_baseline(_cusum_events(spark, 8000, seed=40), bpath)
    sigma = 480.0 / (12.0**0.5)
    batches = [
        _cusum_events(spark, 1000, seed=41),
        _cusum_events(spark, 1000, shift=0.15 * sigma, seed=43),
        _cusum_events(spark, 1000, shift=0.15 * sigma, seed=44),
    ]
    src = _inbox(spark, tmp_path, "cu_inbox", batches)

    def run(tag, fault=None):
        out = str(tmp_path / f"cu_out_{tag}")
        state = str(tmp_path / f"cu_state_{tag}")

        def go():
            stream = spark.readStream.schema(batches[0].schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
            stream_cusum_monitor(
                stream, bpath, state, out,
                str(tmp_path / f"cu_ckpt_{tag}"), fault=fault,
            )

        restarts = _drain(go)
        rows = sorted(
            (
                r["batch_id"], r["grp"], r["status"], r["n_batch"],
                r["s_pos"], r["s_neg"], r["alert"],
            )
            for r in spark.read.parquet(out).collect()
        )
        return restarts, rows

    r_clean, clean = run("clean")
    assert r_clean == 0
    r_soak, soak = run("soak", fault=_once_per_epoch())
    assert r_soak == len(batches)  # every epoch failed once
    assert soak == clean  # bit-identical recovery, alarms included
    # And the run was substantive: the shift actually alarms.
    assert any(t[-1] for t in clean)


def test_heavy_hitters_flaky_every_epoch_matches_clean_run(
    spark, tmp_path
):
    """Merged-sketch monitor under per-epoch first-attempt failures:
    a replayed epoch overwrites its sketch/items partitions, so the
    merge never double-counts — final top-k identical to a clean
    run's, exact counts included."""
    batches = [
        spark.createDataFrame(
            [(i, "alpha" if i % 3 else "beta") for i in range(60)],
            "event_id long, event_type string",
        ),
        spark.createDataFrame(
            [(i, "beta" if i % 2 else "gamma") for i in range(40)],
            "event_id long, event_type string",
        ),
    ]
    src = _inbox(spark, tmp_path, "hh_inbox_fi", batches)

    def run(tag, fault=None):
        out = str(tmp_path / f"hh_out_{tag}")
        state = str(tmp_path / f"hh_state_{tag}")

        def go():
            stream = spark.readStream.schema(batches[0].schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
            stream_heavy_hitters(
                stream, state, out, str(tmp_path / f"hh_ckpt_{tag}"),
                k=3, fault=fault,
            )

        restarts = _drain(go)
        final = sorted(
            (r["item"], r["est_count"])
            for r in spark.read.parquet(f"{out}/batch_id=1").collect()
        )
        return restarts, final

    r_clean, clean = run("clean")
    assert r_clean == 0
    assert clean == [("alpha", 40), ("beta", 40), ("gamma", 20)]
    r_soak, soak = run("soak", fault=_once_per_epoch())
    assert r_soak == len(batches)
    assert soak == clean


def test_partitioned_sink_flaky_every_epoch(spark, tmp_path):
    """The plain batch_id-partitioned parquet sink under the same
    flaky-every-epoch soak: overwrite-by-partition makes replays
    idempotent without any ledger."""
    from cds_etl_spark.streaming.ops import foreach_batch_partitioned_sink

    n_epochs = 3
    src = _inbox(
        spark, tmp_path, "ps_inbox",
        [_kv(spark, 10 * i, 10 * (i + 1)) for i in range(n_epochs)],
    )
    out = str(tmp_path / "ps_out")
    ckpt = str(tmp_path / "ps_ckpt")
    flaky = _once_per_epoch()

    def run():
        stream = spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        foreach_batch_partitioned_sink(stream, out, ckpt, fault=flaky)

    restarts = _drain(run)
    assert restarts == n_epochs
    back = spark.read.parquet(out)
    assert sorted(r["k"] for r in back.collect()) == list(
        range(10 * n_epochs)
    )
    assert back.count() == back.select("k").distinct().count()
