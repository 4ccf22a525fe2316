#!/usr/bin/env python
"""Cold + warm per-query profile (r15 optimization round).

Cold = plan build (QUERIES[name] call, including any eager
localCheckpoint work) + first noop save, all timed. Warm = best of two
further saves of the SAME bound writer (the registry_sweep protocol).
Reporting both keeps checkpointed queries honest: a localCheckpoint
moves work from the warm-timed region into the build, so the warm
number alone would overstate the win.

Usage: python tools/qprof.py <sf_dir> [names...]
Prints one JSON line per query:
    {"name":..., "cold":..., "warm":..., "x1task": N}
x1task = number of final-plan exchanges feeding a 1-partition
AQEShuffleRead (the AQE-coalesced-to-one-task smell, guide §2.5).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.plans import QUERIES  # noqa: E402
from cds_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        rec: dict = {"name": name}
        try:
            spark.sparkContext.setJobDescription(f"qprof: {name}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            w = df.write.format("noop").mode("overwrite")
            w.save()
            rec["cold"] = round(time.perf_counter() - t0, 4)
            warm = []
            for _ in range(2):
                t0 = time.perf_counter()
                w.save()
                warm.append(time.perf_counter() - t0)
            rec["warm"] = round(min(warm), 4)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec["x1task"] = len(
                re.findall(r"AQEShuffleRead coalesced.*\n?", plan)
            ) and sum(
                1
                for ln in plan.splitlines()
                if "AQEShuffleRead" in ln and "coalesced" in ln
            )
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {str(exc)[:160]}"
        print(json.dumps(rec), flush=True)
        # Measurement hygiene: checkpointed queries leave their
        # localCheckpoint blocks persisted until the DataFrame is
        # GC'd; across a batch of heavy queries the accumulated
        # blocks evict each other and the NEXT query's warm runs pay
        # disk reads + GC churn (qs135 measured 2.8 s alone vs 20 s
        # ninth-in-batch). Drop every persisted RDD between queries
        # so each measurement starts from a clean block manager.
        df = None
        gc.collect()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
