"""Incremental aggregate maintenance (operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.operators.incremental import (
    aggregate_delta,
    merge_aggregate_state,
)

SPEC = {"n": ("count", ""), "total": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_merge_equals_from_scratch(spark):
    b1 = _batch(spark, [("a", 1), ("a", 5), ("b", 2)])
    b2 = _batch(spark, [("a", 3), ("c", 7)])
    state = aggregate_delta(b1, ["k"], SPEC)
    merged = merge_aggregate_state(
        state, aggregate_delta(b2, ["k"], SPEC), ["k"], SPEC
    )
    full = aggregate_delta(b1.unionByName(b2), ["k"], SPEC)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_is_associative_across_batch_orders(spark):
    batches = [
        _batch(spark, [("a", i), ("b", 10 - i)]) for i in range(1, 4)
    ]
    def fold(order):
        st = aggregate_delta(batches[order[0]], ["k"], SPEC)
        for i in order[1:]:
            st = merge_aggregate_state(
                st, aggregate_delta(batches[i], ["k"], SPEC), ["k"], SPEC
            )
        return sorted(map(tuple, st.collect()))
    assert fold([0, 1, 2]) == fold([2, 0, 1])


def test_nulls_and_new_keys(spark):
    b1 = spark.createDataFrame([("a", None)], "k string, v long")
    b2 = _batch(spark, [("b", 4)])
    st = merge_aggregate_state(
        aggregate_delta(b1, ["k"], SPEC),
        aggregate_delta(b2, ["k"], SPEC),
        ["k"],
        SPEC,
    )
    got = {r["k"]: (r["n"], r["total"], r["lo"], r["hi"]) for r in st.collect()}
    # all-null input: count counts rows, sum/min/max stay NULL
    assert got == {"a": (1, None, None, None), "b": (1, 4, 4, 4)}


def test_rejects_non_decomposable_kind(spark):
    with pytest.raises(ValueError):
        aggregate_delta(_batch(spark, [("a", 1)]), ["k"], {"m": ("median", "v")})
