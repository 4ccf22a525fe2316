"""Z-order layout (sources/zorder.py): multi-column pruning evidence.

The measurable contract: after z-ordering on (a, b), a box predicate
on EITHER column overlaps few output files' footer min/max ranges,
whereas a layout sorted linearly by `a` alone leaves `b`'s per-file
ranges spanning the domain (no pruning). File-footer overlap counting
is the engine-independent proxy for the scan pruning a cluster does.
"""

import glob
import os

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.sources.zorder import write_zordered, zorder_value

N_FILES = 16


def _overlap_count(spark, path, col, lo, hi):
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    n = 0
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        if row["lo"] is not None and not (row["hi"] < lo or row["lo"] > hi):
            n += 1
    return n, len(files)


def test_zorder_prunes_on_both_columns(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(o, ["o_custkey", "o_totalprice"], zpath, n_files=N_FILES)
    # linear baseline: range-sorted by o_custkey only
    (
        o.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    stats = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    ck_lo, ck_hi = stats[0], stats[1]
    tp_lo, tp_hi = stats[2], stats[3]
    ck_band = (ck_lo, ck_lo + (ck_hi - ck_lo) * 0.1)
    tp_band = (tp_lo, tp_lo + (tp_hi - tp_lo) * 0.1)

    z_ck, z_total = _overlap_count(spark, zpath, "o_custkey", *ck_band)
    z_tp, _ = _overlap_count(spark, zpath, "o_totalprice", *tp_band)
    l_tp, l_total = _overlap_count(spark, lpath, "o_totalprice", *tp_band)

    # z-layout prunes on both interleaved dimensions...
    assert z_ck < z_total / 2
    assert z_tp < z_total / 2
    # ...while the single-column sort cannot prune the other column.
    assert l_tp > l_total / 2
    assert z_tp < l_tp

    # correctness: layout never changes query results
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("o_totalprice").between(*tp_band))
        .count()
    )
    want = o.filter(F.col("o_totalprice").between(*tp_band)).count()
    assert got == want


def test_zorder_value_is_deterministic_and_bounded(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    z = o.select(zorder_value(o, ["o_custkey", "o_totalprice"], bits=4).alias("z"))
    row = z.agg(F.min("z"), F.max("z"), F.count(F.lit(1))).first()
    assert row[0] >= 0
    assert row[1] < 1 << 8  # 2 cols x 4 bits
    assert row[2] > 0


def test_quantile_ranks_spread_skewed_column(spark):
    import math

    from pyspark.sql import functions as F2

    # heavy-tailed column: uniform ranks collapse, quantile ranks spread
    rows = [(i, math.exp(i / 40.0)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v double")
    def max_occupancy(z_df):
        counts = [r[1] for r in z_df.groupBy("z").count().collect()]
        return max(counts) / sum(counts)

    uni = df.select(zorder_value(df, ["v"], bits=4).alias("z"))
    qua = df.select(zorder_value(df, ["v"], bits=4, quantile=True).alias("z"))
    # uniform slicing dumps most of the heavy tail into one bucket;
    # quantile ranks spread rows near-evenly over the 16 buckets
    assert max_occupancy(uni) > 0.5
    assert max_occupancy(qua) < 0.15


def test_uniform_stats_on_empty_or_all_null_raises(spark):
    """Empty input / all-null column must fail with a descriptive
    error, not a TypeError from float(None)."""
    import pytest

    empty = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="no non-null values"):
        zorder_value(empty, ["a", "b"])
    allnull = spark.createDataFrame([(None, 1), (None, 2)], "a long, b long")
    with pytest.raises(ValueError, match="'a'"):
        zorder_value(allnull, ["a", "b"])
