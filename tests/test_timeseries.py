"""Time-series ops (operators/timeseries.py): fill + densify."""

import datetime

from cds_etl_spark.operators.timeseries import forward_fill, resample

T = datetime.datetime


def test_forward_fill_carries_last_observation(spark):
    df = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0), None),   # leading null stays null
            (1, T(2024, 1, 1, 1), 5.0),
            (1, T(2024, 1, 1, 2), None),
            (1, T(2024, 1, 1, 3), 7.0),
            (2, T(2024, 1, 1, 0), None),   # other key: independent
        ],
        "k long, ts timestamp, v double",
    )
    out = forward_fill(df, "ts", ["v"], ["k"])
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    assert got[(1, T(2024, 1, 1, 0))] is None
    assert got[(1, T(2024, 1, 1, 2))] == 5.0
    assert got[(1, T(2024, 1, 1, 3))] == 7.0
    assert got[(2, T(2024, 1, 1, 0))] is None


def test_resample_densifies_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 10), 2.0),
            (1, T(2024, 1, 1, 0, 40), 3.0),
            # hour 1 empty
            (1, T(2024, 1, 1, 2, 5), 1.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = resample(df, "k", "ts", "v", step="1 hour")
    got = {r["bucket"]: (r["n"], r["total"]) for r in out.collect()}
    assert got == {
        T(2024, 1, 1, 0): (2, 5.0),
        T(2024, 1, 1, 1): (0, None),
        T(2024, 1, 1, 2): (1, 1.0),
    }
