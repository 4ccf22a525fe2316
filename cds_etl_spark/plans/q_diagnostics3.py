"""Round-13 diagnostics family (qs393+): the ANN-serving composition
the r12 verdict asked for — the qs389 MRR/hits@k harness re-run over a
BOUNDED prefix-filter shortlist instead of the exact all-postings join,
so the documented scale path for the EVAL-HARNESS class is proven by a
registered, oracle-hash-checked query instead of asserted in a
docstring.

House conventions (registry module docstring): identical aliases both
sides, integer-exact ranking metrics, no corpus-proportional broadcast
hints (r12 audit rule), windows only over per-query frames (high-card
partition keys — see tools/window_audit.py).

Reference parity: none of these exist in cds-etl (its analytics stop at
per-table validation counts, cds_validation_functions.py); they extend
SURVEY.md §2.3's retrieval-eval tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# qs393 MRR/hits@k over a prefix-filter candidate shortlist (the ANN
# serving path), exact-harness-comparable cell by cell with qs389
# ---------------------------------------------------------------------------


@query(
    "qs393_mrr_prefix_shortlist",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(list_distinct(
               string_split(lower(text), ' '))) AS term
      FROM documents),
    tkc AS (SELECT doc_id, term FROM tk WHERE term <> ''),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
           FROM tkc GROUP BY 1),
    q AS (SELECT doc_id AS qid, source AS qsrc FROM documents
          WHERE doc_id % 50 = 0),
    pref AS (
      SELECT qid, qsrc, term FROM (
        SELECT q.qid, q.qsrc, t.term,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY df.df, t.term) AS prk
        FROM q
        JOIN tkc t ON t.doc_id = q.qid
        JOIN df ON df.term = t.term)
      WHERE prk <= 3),
    cand AS (
      SELECT DISTINCT p.qid, p.qsrc, t.doc_id AS cid
      FROM pref p
      JOIN tkc t ON t.term = p.term AND t.doc_id <> p.qid),
    arr AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(lower(text), ' '),
                                       x -> x <> '')) AS ts
      FROM documents),
    ov AS (
      SELECT c.qid, c.qsrc, c.cid, d.source AS csrc,
             len(list_intersect(a1.ts, a2.ts)) AS overlap
      FROM cand c
      JOIN arr a1 ON a1.doc_id = c.qid
      JOIN arr a2 ON a2.doc_id = c.cid
      JOIN documents d ON d.doc_id = c.cid),
    ranked AS (
      SELECT qid, qsrc, csrc,
             ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY overlap DESC, cid) AS rk
      FROM ov),
    firstrel AS (
      SELECT qid, MIN(CASE WHEN csrc = qsrc AND rk <= 10 THEN rk END)
               AS fr
      FROM ranked GROUP BY qid),
    per AS (
      SELECT q.qid, f.fr
      FROM q LEFT JOIN firstrel f ON f.qid = q.qid)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN fr = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_1,
           CAST(SUM(CASE WHEN fr <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_3,
           CAST(SUM(CASE WHEN fr <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_10,
           CAST(SUM(COALESCE(1000000 // fr, 0)) // COUNT(*) AS BIGINT)
             AS mrr_e6
    FROM per
    """,
)
def qs393(spark: SparkSession, sf: str) -> DataFrame:
    """MRR + hits@k over a PREFIX-FILTER candidate shortlist — the
    qs389 harness (every 50th document queries the corpus,
    same-source is relevant, ranks ordered by distinct-token overlap
    with id tiebreaks) re-run the way a serving system actually
    retrieves: each query joins only its 3 globally-rarest tokens
    (df ascending, term tiebreak) against the postings, full overlap
    is computed ONLY on that candidate set, and the metric is taken
    over the ranked top-10 shortlist. Output aliases match qs389
    column for column, so shortlist-vs-exact recall is a direct
    cell-by-cell diff (the BASELINE.md r13 recall cell).

    Determinism: prefix selection orders by exact-integer (df, term);
    overlap is an integer; ranks tie-break by cid; each reciprocal is
    floor(1e6/rank) and MRR their integer-mean floor — zero floating
    point end to end. SCALE: this is the documented scale path for
    the EVAL-HARNESS class (qs213/qs215/qs233/qs389) made concrete —
    the candidate join moves 3 postings per query instead of the full
    ~|tokens| postings, so shuffle is bounded by 3·max_df per query
    (on a Zipfian corpus the rarest tokens' df is tiny; on this
    synthetic 31-term vocabulary it still cuts candidate generation
    ~8×), and the O(candidate) overlap verify replaces the
    O(query·corpus) exact join. Recall loss is measurable, not
    assumed: qs389 is the exact reference."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), " "))
        ).alias("term"),
    ).filter(F.col("term") != "")
    dfreq = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    q = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"), F.col("source").alias("qsrc")
    )
    qt = (
        toks.join(q, toks["doc_id"] == q["qid"])
        .join(dfreq, "term")
        .select("qid", "qsrc", "term", "df")
    )
    # 3 rarest query tokens — the prefix; the window partitions on
    # qid (query-count-sized, high-card) over that query's ~|tokens|
    # rows, never the corpus.
    pref = (
        qt.withColumn(
            "prk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("df", "term")
            ),
        )
        .filter(F.col("prk") <= 3)
        .select("qid", "qsrc", "term")
    )
    cand = (
        pref.join(
            toks.select(F.col("doc_id").alias("cid"), "term"), "term"
        )
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "qsrc", "cid")
        .distinct()
    )
    arr = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("ts"),
    )
    ov = (
        cand.join(
            arr.select(F.col("doc_id").alias("qid"), F.col("ts").alias("qts")),
            "qid",
        )
        .join(
            arr.select(F.col("doc_id").alias("cid"), F.col("ts").alias("cts")),
            "cid",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("cid"), F.col("source").alias("csrc")
            ),
            "cid",
        )
        .select(
            "qid",
            "qsrc",
            "cid",
            "csrc",
            F.size(F.array_intersect(F.col("qts"), F.col("cts"))).alias(
                "overlap"
            ),
        )
    )
    ranked = ov.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.col("overlap").desc(), "cid")
        ),
    )
    firstrel = ranked.groupBy("qid").agg(
        F.min(
            F.when(
                (F.col("csrc") == F.col("qsrc")) & (F.col("rk") <= 10),
                F.col("rk"),
            )
        ).alias("fr")
    )
    per = q.join(firstrel, "qid", "left")
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("fr") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hits_at_1"),
        F.sum(F.when(F.col("fr") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("hits_at_3"),
        F.sum(F.when(F.col("fr") <= 10, 1).otherwise(0))
        .cast("long")
        .alias("hits_at_10"),
        F.expr(
            "CAST(SUM(COALESCE(1000000 div fr, 0)) div COUNT(*) AS LONG)"
        ).alias("mrr_e6"),
    )
