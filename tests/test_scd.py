"""SCD2 apply (operators/scd.py): close/open/insert/no-op branches."""

import datetime

from cds_etl_spark.operators.scd import scd2_apply

D = datetime.date


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "key long, attr string, valid_from date, valid_to date"
    )


def _updates(spark, rows):
    return spark.createDataFrame(rows, "key long, attr string, eff date")


def _apply(spark, dim_rows, upd_rows):
    out = scd2_apply(
        _state(spark, dim_rows), _updates(spark, upd_rows), "key", ["attr"], "eff"
    )
    return {tuple(r) for r in out.collect()}


def test_changed_key_closes_and_reopens(spark):
    got = _apply(
        spark,
        [(1, "a", D(1995, 1, 1), None)],
        [(1, "b", D(1996, 6, 1))],
    )
    assert got == {
        (1, "a", D(1995, 1, 1), D(1996, 6, 1)),
        (1, "b", D(1996, 6, 1), None),
    }


def test_identical_update_is_noop(spark):
    got = _apply(
        spark,
        [(1, "a", D(1995, 1, 1), None)],
        [(1, "a", D(1996, 6, 1))],
    )
    assert got == {(1, "a", D(1995, 1, 1), None)}


def test_new_key_inserted_live(spark):
    got = _apply(spark, [(1, "a", D(1995, 1, 1), None)], [(2, "z", D(1996, 1, 1))])
    assert got == {
        (1, "a", D(1995, 1, 1), None),
        (2, "z", D(1996, 1, 1), None),
    }


def test_history_rows_pass_through_untouched(spark):
    dim = [
        (1, "old", D(1990, 1, 1), D(1995, 1, 1)),  # closed version
        (1, "a", D(1995, 1, 1), None),
    ]
    got = _apply(spark, dim, [(1, "b", D(1996, 6, 1))])
    assert got == {
        (1, "a", D(1995, 1, 1), D(1996, 6, 1)),
        (1, "b", D(1996, 6, 1), None),
        (1, "old", D(1990, 1, 1), D(1995, 1, 1)),
    }


def test_null_safe_attribute_comparison(spark):
    # NULL -> 'x' is a change; NULL -> NULL is not
    got = _apply(
        spark,
        [(1, None, D(1995, 1, 1), None), (2, None, D(1995, 1, 1), None)],
        [(1, "x", D(1996, 1, 1)), (2, None, D(1996, 1, 1))],
    )
    assert got == {
        (1, None, D(1995, 1, 1), D(1996, 1, 1)),
        (1, "x", D(1996, 1, 1), None),
        (2, None, D(1995, 1, 1), None),
    }


def test_history_only_key_reactivates(spark):
    """A key present ONLY as closed history (deleted/expired) must
    re-enter as a live insert, not vanish — its update matches no live
    row to diff against, and the insert anti-join runs against the
    live slice, not all dimension keys."""
    got = _apply(
        spark,
        [(1, "a", D(1990, 1, 1), D(1995, 1, 1))],  # closed, no live row
        [(1, "b", D(1996, 6, 1))],
    )
    assert got == {
        (1, "a", D(1990, 1, 1), D(1995, 1, 1)),  # history untouched
        (1, "b", D(1996, 6, 1), None),  # re-activated live version
    }
