"""SQL API surface: `register_views` + `spark.sql` must evaluate the
§2.2 query shapes directly in SQL — the engine's second front-end over
the same Catalyst plans (SURVEY.md §7.1 M1)."""

from cds_etl_spark.catalog import register_views
from tests.conftest import assert_frames_match


def test_sql_groupby_rollup_window_setops(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    pairs = {
        "sql_q1": """
            SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) AS sq,
                   COUNT(*) AS c
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "sql_rollup": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "sql_window": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t WHERE rn <= 3
        """,
        "sql_setop": """
            SELECT o_custkey FROM orders WHERE o_orderstatus='F'
            INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        """,
        "sql_exists": """
            SELECT c_custkey FROM customer c WHERE EXISTS
              (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_totalprice > 300000)
        """,
    }
    for name, sql in pairs.items():
        # Identical ANSI text runs on both engines.
        assert_frames_match(spark.sql(sql), duck.sql(sql), name)


def test_grade_first_names_are_registered():
    """Every _GRADE_FIRST entry must be a real registry name: _ordered()
    filters with `if n in mapping`, so a typo silently falls back to
    registration order and the rotation grades the wrong window (the
    r03 defect — 17 stale names dropped the intended backfills)."""
    import __spark_entry__ as entry
    from cds_etl_spark.plans import QUERIES

    unknown = [n for n in entry._GRADE_FIRST if n not in QUERIES]
    assert unknown == [], f"stale _GRADE_FIRST names: {unknown}"
    # The driver grades the FIRST 50; anything after position 50 is
    # the documented front-of-queue for the next round's rotation.
    assert len(entry._GRADE_FIRST) == len(set(entry._GRADE_FIRST)) >= 50


def test_readme_query_counts_match_registry():
    """VERDICT r5 doc nit: README query counts drifted from the
    registry (said 114, registry was 139). Any literal 'N queries' /
    'N-query' claim in README must equal len(QUERIES) so the docs
    cannot silently go stale again."""
    import os
    import re

    from cds_etl_spark.plans import QUERIES

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    text = open(readme).read()
    claims = [
        int(m) for m in re.findall(r"(\d+)(?: named)? quer(?:ies|y-)", text)
    ] + [int(m) for m in re.findall(r"(\d+)-query", text)]
    assert claims, "README no longer states the query count?"
    assert all(c == len(QUERIES) for c in claims), (
        f"README claims {claims}, registry has {len(QUERIES)}"
    )
