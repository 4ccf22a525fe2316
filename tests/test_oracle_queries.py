"""Differential tests: every declared query vs the DuckDB oracle.

Mirrors the driver's t2 check (row count + column names + order-
insensitive value comparison) at a small scale factor so the suite
stays fast while exercising identical semantics.
"""

import pytest

from cds_etl_spark.plans import ORACLE_SQL, QUERIES
from tests.conftest import assert_frames_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLE_SQL:
        # Non-SQL-expressible op: weaker rows-only check, like the driver.
        assert df.count() >= 0
        return
    rel = duck.sql(ORACLE_SQL[name])
    assert_frames_match(df, rel, name)
