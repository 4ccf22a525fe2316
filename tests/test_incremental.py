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


def test_join_delta_matches_full_recompute(spark):
    """Bag-algebra join IVM: after a batch of inserts AND deletes on
    both sides, state + delta == full recompute of the join on the
    updated inputs, as multisets (multiplicity columns compared)."""
    from cds_etl_spark.operators.incremental import (
        apply_delta,
        join_delta,
    )

    def t(rows, schema):
        return spark.createDataFrame(rows, schema)

    # R(k, a) with a duplicate row carried as mult=2; S(k, b).
    r0 = t(
        [(1, "x", 1), (1, "y", 1), (2, "x", 2), (3, "z", 1)],
        "k int, a string, _mult long",
    )
    s0 = t(
        [(1, 10, 1), (2, 20, 1), (2, 21, 1), (4, 40, 1)],
        "k int, b int, _mult long",
    )
    # Delta: insert (3,30) and (1,11) into S, delete (2,20) from S;
    # insert (4,'w') into R, delete one copy of (2,'x') from R.
    dr = t([(4, "w", 1), (2, "x", -1)], "k int, a string, _mult long")
    ds = t(
        [(3, 30, 1), (1, 11, 1), (2, 20, -1)],
        "k int, b int, _mult long",
    )

    def consolidated_join(r, s):
        j = r.withColumnRenamed("_mult", "_ma").join(
            s.withColumnRenamed("_mult", "_mb"), "k"
        )
        j = j.withColumn("_mult", F.col("_ma") * F.col("_mb")).drop(
            "_ma", "_mb"
        )
        return apply_delta(j.limit(0), j)  # consolidate via union-agg

    m0 = consolidated_join(r0, s0)
    m1_inc = apply_delta(m0, join_delta(r0, s0, dr, ds, ["k"]))
    r1, s1 = apply_delta(r0, dr), apply_delta(s0, ds)
    m1_full = consolidated_join(r1, s1)
    as_set = lambda df: sorted(tuple(r) for r in df.collect())
    assert as_set(m1_inc) == as_set(m1_full)
    assert len(as_set(m1_inc)) > 0
    # Full retraction vanishes: delete the remaining (2,'x') copies.
    dr2 = t([(2, "x", -1)], "k int, a string, _mult long")
    ds2 = s1.limit(0)
    m2 = apply_delta(m1_inc, join_delta(r1, s1, dr2, ds2, ["k"]))
    assert all(row["k"] != 2 for row in m2.collect())
