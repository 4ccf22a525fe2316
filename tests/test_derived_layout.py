"""Pre-projected kernel layout (sources/derived.py).

Contract: a query that finds its derived columns present reads them
instead of recomputing, and its OUTPUT is byte-identical to the same
query over the raw directory — the layout moves per-row work to
ingest, never changes an answer. Verified by running the three
consuming queries (qs10 money aggs, qs161 winsorized mean, qs157
perplexity buckets) against a derived copy of the corpus and the raw
directory side by side.
"""

import os

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.catalog import TABLES, load_table
from cds_etl_spark.plans import QUERIES
from cds_etl_spark.sources.derived import DERIVED, has_derived, with_derived


@pytest.fixture(scope="module")
def derived_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("derived_sf")
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if t in DERIVED:
            with_derived(load_table(spark, sf_dir, t), t).write.parquet(
                str(dst)
            )
        else:
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)
    return str(out)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_derived_columns_present(spark, derived_dir):
    li = load_table(spark, derived_dir, "lineitem")
    assert has_derived(
        li, "lineitem", "l_quantity_cents", "l_extendedprice_cents", "l_discprice"
    )
    o = load_table(spark, derived_dir, "orders")
    assert has_derived(o, "orders", "o_totalprice_cents", "o_price_bucket128")
    d = load_table(spark, derived_dir, "documents")
    assert has_derived(d, "documents", "toks_lc")


def test_has_derived_rejects_undeclared_name(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(KeyError):
        has_derived(li, "lineitem", "l_quantity_cent")  # typo


@pytest.mark.parametrize(
    "name",
    [
        "qs10_groupby_agg_tpch_q1",
        "qs161_winsorized_mean",
        "qs157_perplexity_buckets",
    ],
)
def test_derived_layout_value_identical(spark, sf_dir, derived_dir, name):
    raw = QUERIES[name](spark, sf_dir)
    drv = QUERIES[name](spark, derived_dir)
    assert raw.columns == drv.columns
    assert _rows(raw) == _rows(drv)


def test_derived_plan_skips_raw_columns(spark, derived_dir):
    # The point of the layout: qs161's scan must read the derived ints,
    # not o_totalprice — otherwise the per-row work is still paid.
    plan = QUERIES["qs161_winsorized_mean"](
        spark, derived_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "o_totalprice_cents" in plan
    q157 = QUERIES["qs157_perplexity_buckets"](
        spark, derived_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "toks_lc" in q157
