#!/usr/bin/env python
"""Warm scale points for registry queries over the gen tables.

Usage: python tools/scale_audit.py <sf_dir> qs207_feature_hashing [...]
Prints "<name>: <best> s (best of N, warm)" per query — the numbers
BASELINE.md's scale-audit tables record. Run on a settled box
(loadavg < 1.5); plain profile, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.plans import QUERIES
from cds_etl_spark.session import get_spark

RUNS = 2


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        w = QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite")
        w.save()  # warm
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            w.save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f} s (best of {RUNS}, warm)", flush=True)


if __name__ == "__main__":
    main()
