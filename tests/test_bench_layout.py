"""Scale-aware bench layout sizing (bench.bucket_count / range_count)
and the profile threshold — the r5 lesson that layout parameters tuned
at one SF are scale bugs at 100x, encoded as invariants."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

bench = importlib.import_module("bench")
from cds_etl_spark.session import (  # noqa: E402
    LOCAL_LATENCY_LARGE_DATA_BYTES,
    LOCAL_SCALE_RUNTIME_CONFS,
    default_parallelism,
)


def test_bucket_count_floors_and_caps():
    cores = default_parallelism()
    # sf0.1 (150k orders) and sf1 (1.5M) keep the measured-optimal 8.
    assert bench.bucket_count(150_000) == 8
    assert bench.bucket_count(1_500_000) == 8
    # sf10 (15M) scales up; never past the core count (nor below
    # the floor on small-core hosts).
    assert bench.bucket_count(15_000_000) == max(8, min(cores, 15))
    assert bench.bucket_count(10**9) == max(8, cores)


def test_range_count_floors_and_caps():
    cores = default_parallelism()
    assert bench.range_count(600_000) == 16      # sf0.1
    assert bench.range_count(6_000_000) == 16    # sf1
    assert bench.range_count(60_000_000) == max(16, min(2 * cores, 30))  # sf10
    assert bench.range_count(10**10) == max(16, 2 * cores)


def test_counts_are_monotonic_in_rows():
    prev_b = prev_r = 0
    for rows in (10**5, 10**6, 10**7, 10**8, 10**9):
        b, r = bench.bucket_count(rows), bench.range_count(rows)
        assert b >= prev_b and r >= prev_r
        prev_b, prev_r = b, r


def test_scale_profile_restores_scale_settings():
    # The large-data profile must undo every latency trick that
    # inverted at sf10: AQE back on, real scan splits, and the
    # threshold sits between the sf1 (~200 MB) and sf10 (~2 GB) sizes
    # so both measured regimes keep their measured-optimal profile.
    assert LOCAL_SCALE_RUNTIME_CONFS["spark.sql.adaptive.enabled"] == "true"
    assert int(LOCAL_SCALE_RUNTIME_CONFS["spark.sql.files.maxPartitionBytes"]) >= 64 * 1024 * 1024
    assert 300 * 1024**2 < LOCAL_LATENCY_LARGE_DATA_BYTES < 1024**3
