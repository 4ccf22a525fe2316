#!/usr/bin/env python
"""Warm scale points that INCLUDE plan-construction time.

Usage: python tools/plan_build_time.py <sf_dir> qs285_clustering_coefficient [...]

scale_audit.py times only the ``.save()`` of a pre-built plan — correct
for pure plans, but a plan with an eager ``localCheckpoint`` at
construction time pays its dominant cost BEFORE the save. This variant
rebuilds the plan inside the timed region, so checkpointing and
pure-plan queries are measured on the same clock (what a caller of
``queries()[name](spark, sf)`` + collect actually pays). One untimed
warm lap first (OS page cache / JIT), then best of RUNS timed laps,
each lap building a fresh plan.
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
        def lap() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        lap()  # warm
        best = min(lap() for _ in range(RUNS))
        print(f"{name}: {best:.3f} s (build+exec, best of {RUNS}, warm)",
              flush=True)


if __name__ == "__main__":
    main()
