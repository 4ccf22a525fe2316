"""UDF/UDAF/UDTF surface tests (functions/udx.py): the Arrow UDAF must
equal its pure-expression form; the UDTF must produce the generator
semantics both from the DataFrame API and registered SQL."""

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.functions.udx import SplitSentences, register_all, weighted_mean


def test_grouped_agg_udaf_matches_expression(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").limit(2000)
    got = (
        o.groupBy("o_orderstatus")
        .agg(F.round(weighted_mean("o_totalprice", "o_custkey"), 4).alias("wm"))
    )
    want = (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice") * F.col("o_custkey")) / F.sum("o_custkey"),
                4,
            ).alias("wm")
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_udtf_dataframe_and_sql(spark):
    register_all(spark)
    out = spark.sql(
        "SELECT * FROM split_sentences('Hello world. Spark scales out. ')"
    ).collect()
    assert [(r["sentence"], r["n_words"], r["idx"]) for r in out] == [
        ("Hello world", 2, 0),
        ("Spark scales out", 3, 1),
    ]
    # Lateral join form over a table: one row in → N rows out.
    spark.createDataFrame(
        [("a. b. c",), (None,)], "text string"
    ).createOrReplaceTempView("docs_t")
    n = spark.sql(
        "SELECT s.* FROM docs_t, LATERAL split_sentences(text) s"
    ).count()
    assert n == 3
    assert SplitSentences  # exported class
