#!/usr/bin/env python
"""Full-registry warm timing sweep — the r15 optimization round's
measure-first pass (spark_optimization_guide §1).

Runs every registry query (or a named subset) against ``sf_dir`` with
the PLAIN profile into the noop sink, warm best-of-N, and prints one
JSON line per query:

    {"name": "qs...", "best": 0.123, "runs": [..], "err": null}

Usage:
    python tools/registry_sweep.py /root/testdata/sf0.1 [out.jsonl]
    python tools/registry_sweep.py /root/testdata/sf0.1 out.jsonl qs01 qs10

The numbers rank queries by cost so optimization effort lands on the
expensive ones; they are NOT the bench contract (bench.py owns that
protocol). Run on a settled box (loadavg < 1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.plans import QUERIES  # noqa: E402
from cds_etl_spark.session import get_spark  # noqa: E402

RUNS = 2


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    names = sys.argv[3:] or list(QUERIES)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = open(out_path, "w") if out_path else sys.stdout
    for name in names:
        rec: dict = {"name": name, "best": None, "runs": [], "err": None}
        try:
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            w = (
                QUERIES[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
            )
            w.save()  # warm
            for _ in range(RUNS):
                t0 = time.perf_counter()
                w.save()
                rec["runs"].append(round(time.perf_counter() - t0, 4))
            rec["best"] = min(rec["runs"])
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rec["err"] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
        print(json.dumps(rec), file=out, flush=True)
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
