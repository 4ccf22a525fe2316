"""Serial-equality pin for operators/sessions.sessionize_sharded.

The sharded variant must produce BYTE-IDENTICAL session ids to the
serial ``sessionize`` on every input — it is a plan rewire (the r11
skew audit's one recorded scale ceiling: a hot user's whole stream in
one window task), not a semantics change. Pinned here on the real
events table at the test SF plus adversarial boundary fixtures:
sessions continuing across chunk boundaries, gaps spanning several
EMPTY chunks, equal timestamps under tiebreak, exact-gap edges
(strictly-greater semantics), and chunks far smaller than the gap.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.sessions import sessionize, sessionize_sharded

SF_DIR = "/root/testdata/sf0.001"


def _ids(df):
    return {
        (r["event_id"], r["session_id"])
        for r in df.select("event_id", "session_id").collect()
    }


def test_equal_on_events_table(spark):
    e = load_table(spark, SF_DIR, "events")
    serial = sessionize(e, "user_id", "ts", 1800, tiebreak="event_id")
    sharded = sessionize_sharded(
        e, "user_id", "ts", 1800, tiebreak="event_id"
    )
    assert _ids(sharded) == _ids(serial)
    # column surface identical too (sharded drops all temp columns)
    assert sorted(sharded.columns) == sorted(serial.columns)


def test_equal_on_events_table_tiny_chunks(spark):
    """chunk_seconds << gap_seconds: every session spans many chunks
    and almost every boundary must stitch."""
    e = load_table(spark, SF_DIR, "events").limit(2000)
    serial = sessionize(e, "user_id", "ts", 1800, tiebreak="event_id")
    sharded = sessionize_sharded(
        e, "user_id", "ts", 1800, tiebreak="event_id", chunk_seconds=600
    )
    assert _ids(sharded) == _ids(serial)


def _fixture(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def t(sec):
        return base + datetime.timedelta(seconds=sec)

    rows = [
        # u1: one session crossing a 3600-chunk boundary (gap 100 < 1800)
        (1, 1, t(3550)),
        (2, 1, t(3650)),
        # u1: gap of exactly 1800 -> SAME session (strictly-greater)
        (3, 1, t(5450)),
        # u1: gap 1801 -> new session, after several EMPTY chunks
        (4, 1, t(50000)),
        # u2: equal timestamps straddling nothing — tiebreak ordering
        (5, 2, t(100)),
        (6, 2, t(100)),
        (7, 2, t(100)),
        # u2: new session later
        (8, 2, t(10000)),
        # u3: single event
        (9, 3, t(7)),
        # u4: every event its own session, each in its own chunk
        (10, 4, t(0)),
        (11, 4, t(7200)),
        (12, 4, t(14400)),
    ]
    return spark.createDataFrame(
        [(e, u, ts) for e, u, ts in rows],
        "event_id long, user_id long, ts timestamp",
    )


def test_boundary_fixture_exact_ids(spark):
    df = _fixture(spark)
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize_sharded(
            df, "user_id", "ts", 1800, tiebreak="event_id",
            chunk_seconds=3600,
        ).collect()
    }
    assert out == {
        1: "1-1",
        2: "1-1",
        3: "1-1",
        4: "1-2",
        5: "2-1",
        6: "2-1",
        7: "2-1",
        8: "2-2",
        9: "3-1",
        10: "4-1",
        11: "4-2",
        12: "4-3",
    }


def test_boundary_fixture_matches_serial_across_chunk_sizes(spark):
    df = _fixture(spark)
    serial = _ids(sessionize(df, "user_id", "ts", 1800, tiebreak="event_id"))
    for chunk in (60, 1800, 3600, 86_400):
        sharded = _ids(
            sessionize_sharded(
                df, "user_id", "ts", 1800, tiebreak="event_id",
                chunk_seconds=chunk,
            )
        )
        assert sharded == serial, f"chunk_seconds={chunk}"


def test_hot_user_parallelism_shape(spark):
    """The point of the rewire: a single user's events spread over
    many (user, chunk) shards instead of one window partition. Checks
    the numbering stays dense/correct on a 1-user stream with mixed
    gaps."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    sid = 0
    expect = {}
    sec = 0.0
    for i in range(500):
        gap = 100.0 if i % 7 else 2000.0  # new session every 7th event
        sec += gap
        if gap > 1800.0:
            sid += 1
        rows.append((i, 42, base + datetime.timedelta(seconds=sec)))
        expect[i] = f"42-{sid}"
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize_sharded(
            df, "user_id", "ts", 1800, tiebreak="event_id",
            chunk_seconds=3600,
        ).collect()
    }
    assert out == expect
    # and the serial operator agrees
    assert out == {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            df, "user_id", "ts", 1800, tiebreak="event_id"
        ).collect()
    }


def test_fractional_second_boundaries(spark):
    """Micro-precision timestamps: the epoch-double comparison must
    behave identically in both variants (the qs43 portability rule)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 9, base),
        (2, 9, base + datetime.timedelta(seconds=1800, microseconds=1)),
        (3, 9, base + datetime.timedelta(seconds=3600.5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    serial = _ids(sessionize(df, "user_id", "ts", 1800, tiebreak="event_id"))
    sharded = _ids(
        sessionize_sharded(
            df, "user_id", "ts", 1800, tiebreak="event_id",
            chunk_seconds=1800,
        )
    )
    assert sharded == serial
