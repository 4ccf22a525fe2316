"""Drift monitoring (operators/drift.py + stream_drift_monitor).

Contracts: the operator-level PSI agrees with qs159's query on the
same split; a same-distribution batch scores near zero against the
baseline; a shifted batch trips the alert; replayed epochs overwrite
idempotently (partition-named sink).
"""

import numpy as np

from pyspark.sql import functions as F

from cds_etl_spark.operators.drift import (
    bin_histogram,
    build_drift_baseline,
    psi,
)


def _events(spark, n, shift=0.0, seed=0, etype="click"):
    rng = np.random.default_rng(seed)
    vals = np.clip(rng.uniform(0, 480, n) + shift, 0.0, 511.0)
    return spark.createDataFrame(
        [(i, etype, float(v)) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )


def test_psi_matches_query_formulation(spark, sf_dir, duck):
    """operators/drift.psi over the qs159 split == qs159's output."""
    from cds_etl_spark.catalog import load_table
    from cds_etl_spark.plans import QUERIES

    ev = load_table(spark, sf_dir, "events")
    h1 = bin_histogram(ev.filter(F.dayofmonth("ts") <= 15))
    h2 = bin_histogram(ev.filter(F.dayofmonth("ts") > 15))
    got = {
        r["grp"]: (r["n_current"], r["n_baseline"], r["psi"])
        for r in psi(h1, h2).collect()
    }
    want = {
        r["event_type"]: (r["n_before"], r["n_after"], r["psi"])
        for r in QUERIES["qs159_psi_drift"](spark, sf_dir).collect()
    }
    assert got == want


def test_psi_zero_for_identical_and_large_for_shift(spark):
    base = bin_histogram(_events(spark, 4000, seed=1))
    same = bin_histogram(_events(spark, 4000, seed=2))
    moved = bin_histogram(_events(spark, 4000, shift=200.0, seed=3))
    low = psi(same, base).first()["psi"]
    high = psi(moved, base).first()["psi"]
    assert low < 0.05, low
    assert high > 0.25, high


def test_stream_drift_monitor(spark, tmp_path):
    from cds_etl_spark.streaming.ops import stream_drift_monitor

    baseline = _events(spark, 4000, seed=10)
    bpath = str(tmp_path / "baseline")
    build_drift_baseline(baseline, bpath)

    b1 = _events(spark, 2000, seed=11)               # stable batch
    b2 = _events(spark, 2000, shift=220.0, seed=12)  # drifted batch
    src = str(tmp_path / "drift_inbox")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "drift_out")
    stream_drift_monitor(
        stream, bpath, out, str(tmp_path / "drift_ckpt")
    )
    rows = spark.read.parquet(out).collect()
    by_batch = {r["batch_id"]: r for r in rows}
    assert len(by_batch) == 2
    assert not by_batch[0]["alert"] and by_batch[0]["psi"] < 0.05
    assert by_batch[1]["alert"] and by_batch[1]["psi"] > 0.25
    assert by_batch[0]["n_baseline"] == 4000
    assert by_batch[0]["n_current"] == 2000


def test_zscore_anomalies_planted_outliers(spark, tmp_path):
    from cds_etl_spark.operators.drift import (
        build_anomaly_baseline,
        zscore_anomalies,
    )

    bpath = str(tmp_path / "anom_base")
    build_anomaly_baseline(_events(spark, 4000, seed=20), bpath)
    base = spark.read.parquet(bpath)
    # Uniform(0,480): sigma ~ 138.6, max |x-mu| = 240 < 3 sigma — a
    # same-distribution batch flags NOTHING.
    clean = _events(spark, 1000, seed=21)
    assert zscore_anomalies(clean, base).count() == 0
    # Planted wild rows — exactly those flag, with the right sign.
    planted = clean.unionByName(
        spark.createDataFrame(
            [(9001, "click", 5000.0), (9002, "click", -4000.0)],
            clean.schema,
        )
    )
    rows = zscore_anomalies(planted, base).collect()
    assert {(r["event_id"], r["zscore"] > 0) for r in rows} == {
        (9001, True),
        (9002, False),
    }
    # Unknown group = schema event, not a point anomaly: no flag.
    alien = spark.createDataFrame(
        [(9003, "martian", 1e9)], clean.schema
    )
    assert zscore_anomalies(alien, base).count() == 0


def test_stream_anomaly_monitor(spark, tmp_path):
    from cds_etl_spark.operators.drift import build_anomaly_baseline
    from cds_etl_spark.streaming.ops import stream_anomaly_monitor

    bpath = str(tmp_path / "anom_base2")
    build_anomaly_baseline(_events(spark, 4000, seed=30), bpath)

    b1 = _events(spark, 1000, seed=31)  # clean batch
    b2 = _events(spark, 1000, seed=32).unionByName(
        spark.createDataFrame(
            [(9001, "click", 5000.0), (9002, "click", 4500.0)],
            "event_id long, event_type string, value double",
        )
    )
    src = str(tmp_path / "anom_inbox")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "anom_out")
    stream_anomaly_monitor(
        stream, bpath, out, str(tmp_path / "anom_ckpt")
    )
    rows = spark.read.parquet(out).collect()
    # Only the planted pair across both epochs, in batch 2's partition.
    assert {(r["batch_id"], r["event_id"]) for r in rows} == {
        (1, 9001),
        (1, 9002),
    }
    assert all(r["zscore"] > 3 for r in rows)


def test_zscore_rolling_sharded_equals_serial(spark):
    """The day-sharded formulation must produce EXACTLY the serial
    qs167 result — same ids, same cents — on the real testdata, where
    windows routinely cross day boundaries."""
    from cds_etl_spark.catalog import load_table
    from cds_etl_spark.operators.drift import zscore_anomalies_rolling
    from cds_etl_spark.plans import QUERIES

    for sf, shard in [
        ("/root/testdata/sf0.001", "week"),  # thin days -> coarser
        ("/root/testdata/sf0.01", "day"),
    ]:
        serial = sorted(
            tuple(r)
            for r in QUERIES["qs167_zscore_anomaly"](spark, sf).collect()
        )
        ev = load_table(spark, sf, "events")
        sharded = sorted(
            tuple(r)
            for r in zscore_anomalies_rolling(ev, shard=shard).collect()
        )
        assert sharded == serial and len(serial) > 0


def test_zscore_rolling_precondition_raises(spark):
    """A shard too small to carry the window's context must fail
    loudly, never silently mis-frame."""
    import pytest

    from cds_etl_spark.operators.drift import zscore_anomalies_rolling

    rows = [
        # Day 1: 25 rows; day 2: only 3 rows (< n) -> day 3 would be
        # under-contexted... day 2 itself violates (di=2, c=3).
        (i, "click", f"2026-01-0{1 + (i >= 25) + (i >= 28)}T0{i % 10}:0{i % 6}:00", 10.0 + i)
        for i in range(31)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, s string, value double"
    ).withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    with pytest.raises(ValueError, match="day-shard"):
        zscore_anomalies_rolling(df)


def test_stream_cusum_monitor_accumulates_small_shift(spark, tmp_path):
    """A persistent +0.15 sigma mean shift: far inside the z=3 row
    gate (stream_anomaly_monitor never flags it), but the CUSUM
    recursion accumulates the standardized BATCH means and alarms
    within two shifted epochs. Clean epochs stay quiet; a group
    absent from a batch carries its accumulation forward unchanged."""
    from cds_etl_spark.operators.drift import build_anomaly_baseline
    from cds_etl_spark.streaming.ops import stream_cusum_monitor

    bpath = str(tmp_path / "cusum_base")
    build_anomaly_baseline(_events(spark, 8000, seed=40), bpath)
    sigma = 480.0 / (12.0 ** 0.5)  # uniform(0,480)

    batches = [
        _events(spark, 1000, seed=41),                       # clean
        _events(spark, 1000, seed=42),                       # clean
        _events(spark, 1000, shift=0.15 * sigma, seed=43),   # shifted
        _events(spark, 1000, shift=0.15 * sigma, seed=44),   # shifted
    ]
    src = str(tmp_path / "cusum_inbox")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(batches[0].schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "cusum_out")
    state = str(tmp_path / "cusum_state")
    stream_cusum_monitor(
        stream, bpath, state, out, str(tmp_path / "cusum_ckpt")
    )

    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(out).filter(
            F.col("grp") == "click"
        ).collect()
    }
    assert len(rows) == 4
    # Clean epochs: no alert, bounded accumulation.
    assert not rows[0]["alert"] and not rows[1]["alert"]
    # The shift accumulates: S+ strictly grows across shifted epochs
    # and crosses h by the second one.
    assert rows[2]["s_pos"] > rows[1]["s_pos"]
    assert rows[3]["s_pos"] > rows[2]["s_pos"]
    assert rows[3]["alert"]
    # Row-level z against the reference never reaches 3 for a 0.15
    # sigma shift of a bounded uniform (the monitor this completes).
    assert 0.15 * sigma + 240.0 < 3.0 * sigma


def test_stream_cusum_absent_group_carries_state(spark, tmp_path):
    """An epoch without a group's rows must neither reset nor grow
    that group's CUSUM state (full-outer carry-forward)."""
    from cds_etl_spark.operators.drift import build_anomaly_baseline
    from cds_etl_spark.streaming.ops import stream_cusum_monitor

    bpath = str(tmp_path / "cusum_base2")
    base = _events(spark, 4000, seed=50).unionByName(
        _events(spark, 4000, seed=51, etype="view")
    )
    build_anomaly_baseline(base, bpath)
    sigma = 480.0 / (12.0 ** 0.5)

    b1 = _events(spark, 800, shift=0.2 * sigma, seed=52).unionByName(
        _events(spark, 800, seed=53, etype="view")
    )
    b2 = _events(spark, 800, seed=54, etype="view")  # no "click" rows
    src = str(tmp_path / "cusum_inbox2")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "cusum_out2")
    stream_cusum_monitor(
        stream,
        bpath,
        str(tmp_path / "cusum_state2"),
        out,
        str(tmp_path / "cusum_ckpt2"),
    )
    click = {
        r["batch_id"]: r
        for r in spark.read.parquet(out).filter(
            F.col("grp") == "click"
        ).collect()
    }
    assert click[0]["s_pos"] > 0.0
    assert click[1]["n_batch"] == 0
    assert click[1]["s_pos"] == click[0]["s_pos"]
    assert click[1]["s_neg"] == click[0]["s_neg"]


def test_stream_cusum_replay_recomputes_identically(spark, tmp_path):
    """Exactly-once story: re-running the same inbox with a FRESH
    checkpoint against the SAME state directory (the worst replay —
    every epoch re-fires with its own state partitions already on
    disk) must recompute byte-identical state and output, because
    epoch N reads only epochs < N and overwrites its own partition."""
    from cds_etl_spark.operators.drift import build_anomaly_baseline
    from cds_etl_spark.streaming.ops import stream_cusum_monitor

    bpath = str(tmp_path / "base")
    build_anomaly_baseline(_events(spark, 4000, seed=60), bpath)
    src = str(tmp_path / "inbox")
    for seed in (61, 62, 63):
        _events(spark, 500, shift=30.0 * (seed % 2), seed=seed).coalesce(
            1
        ).write.mode("append").parquet(src)

    def run(tag):
        stream = spark.readStream.schema(
            _events(spark, 1, seed=0).schema
        ).option("maxFilesPerTrigger", 1).parquet(src)
        out = str(tmp_path / f"out_{tag}")
        stream_cusum_monitor(
            stream,
            bpath,
            str(tmp_path / "state"),          # SHARED state dir
            out,
            str(tmp_path / f"ckpt_{tag}"),    # fresh checkpoint
        )
        return sorted(
            (r["batch_id"], r["grp"], r["n_batch"],
             round(r["s_pos"], 12), round(r["s_neg"], 12), r["alert"])
            for r in spark.read.parquet(out).collect()
        )

    first = run("a")
    second = run("b")   # full replay over pre-existing state
    assert first == second and len(first) == 3


def test_stream_cusum_surfaces_unbaselined_group_and_status(spark, tmp_path):
    """A batch group with no reference moments must surface with
    status='no_baseline' (not silently drop), ok rows read
    status='ok', and a group absent from the batch reads
    status='carried'."""
    from cds_etl_spark.operators.drift import build_anomaly_baseline
    from cds_etl_spark.streaming.ops import stream_cusum_monitor

    bpath = str(tmp_path / "cusum_base3")
    base = _events(spark, 4000, seed=70).unionByName(
        _events(spark, 4000, seed=71, etype="view")
    )
    build_anomaly_baseline(base, bpath)

    # Batch 1: click + a brand-new group the baseline never saw.
    b1 = _events(spark, 400, seed=72).unionByName(
        _events(spark, 400, seed=73, etype="install")
    )
    # Batch 2: only "view" rows — click carries.
    b2 = _events(spark, 400, seed=74, etype="view")
    src = str(tmp_path / "cusum_inbox3")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "cusum_out3")
    stream_cusum_monitor(
        stream,
        bpath,
        str(tmp_path / "cusum_state3"),
        out,
        str(tmp_path / "cusum_ckpt3"),
    )
    rows = {
        (r["batch_id"], r["grp"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(0, "install")]["status"] == "no_baseline"
    assert rows[(0, "install")]["n_batch"] == 400
    assert rows[(0, "install")]["s_pos"] == 0.0  # held, not NULLed
    assert rows[(0, "click")]["status"] == "ok"
    assert rows[(1, "click")]["status"] == "carried"
    assert rows[(1, "click")]["n_batch"] == 0


def test_stream_page_hinkley_matches_reference_and_alarms(spark, tmp_path):
    """Reference-free PH: per-(group, epoch) batch means feed the
    running-mean recursion m += x̄ − mean − δ; a sustained level shift
    drives m − min(m) past λ while clean epochs stay quiet. Parity is
    checked against an independent python replay of the SAME batch
    means (the monitor's declared semantics), and an absent-group
    epoch must carry state unchanged."""
    from cds_etl_spark.streaming.ops import stream_page_hinkley_monitor

    sigma = 480.0 / (12.0 ** 0.5)
    batches = [
        _events(spark, 800, seed=61),
        _events(spark, 800, seed=62),
        _events(spark, 800, seed=63, etype="view"),      # no "click"
        _events(spark, 800, shift=0.8 * sigma, seed=64),
        _events(spark, 800, shift=0.8 * sigma, seed=65),
    ]
    src = str(tmp_path / "ph_inbox")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(batches[0].schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "ph_out")
    stream_page_hinkley_monitor(
        stream,
        str(tmp_path / "ph_state"),
        out,
        str(tmp_path / "ph_ckpt"),
        delta=0.0,
        lam=0.7 * sigma,
    )
    got = {
        r["batch_id"]: r
        for r in spark.read.parquet(out)
        .filter(F.col("grp") == "click")
        .collect()
    }
    assert len(got) == 5
    # Independent replay of the declared per-epoch semantics.
    means = {
        i: b.filter(F.col("event_type") == "click")
        .agg(F.avg("value"))
        .collect()[0][0]
        for i, b in enumerate(batches)
        if i != 2
    }
    cnt = xsum = mt = mt_min = 0.0
    for i in range(5):
        if i == 2:                      # carried epoch
            assert got[i]["status"] == "carried"
            assert got[i]["mt"] == got[i - 1]["mt"]
            assert got[i]["cnt"] == got[i - 1]["cnt"]
            continue
        cnt += 1
        xsum += means[i]
        mt += means[i] - xsum / cnt - 0.0
        mt_min = min(mt_min, mt)
        assert abs(got[i]["mt"] - mt) < 1e-9, i
        assert abs(got[i]["ph"] - (mt - mt_min)) < 1e-9, i
    # Clean epochs quiet; the sustained shift alarms by the last one.
    assert not got[0]["alert"] and not got[1]["alert"]
    assert got[4]["alert"]
