"""PageRank (operators/components.pagerank) structural invariants."""

import pytest
from pyspark.sql import functions as F

from cds_etl_spark.operators.components import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s long, d long")


def _ranks(spark, pairs, **kw):
    out = pagerank(_edges(spark, pairs), "s", "d", **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_ranks_sum_to_one_and_ring_is_uniform(spark):
    ring = [(i, (i + 1) % 5) for i in range(5)]
    got = _ranks(spark, ring)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in got.values():
        assert v == pytest.approx(0.2, abs=1e-9)


def test_star_center_ranks_highest(spark):
    star = [(i, 0) for i in range(1, 6)]  # everyone points at 0
    got = _ranks(spark, star)
    assert got[0] == max(got.values())
    assert got[0] > 3 * got[1]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_is_redistributed(spark):
    # 1 -> 2, 2 dangling: without redistribution total rank leaks
    got = _ranks(spark, [(1, 2)])
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[2] > got[1]


def test_undirected_symmetrizes(spark):
    got = _ranks(spark, [(1, 2), (2, 3)], directed=False)
    assert got[2] == max(got.values())  # middle of the path
    assert got[1] == pytest.approx(got[3], abs=1e-12)
