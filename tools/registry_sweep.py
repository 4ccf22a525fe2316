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

Per-execution watchdog (SWEEP_TIMEOUT, default 90 s): a query whose
single execution exceeds the cap is cancelled via cancelJobGroup and
recorded as {"timeout": true} with the elapsed floor — monsters get
ranked without stalling the 401-query pass (the first sweep sat 15+
minutes inside one quadratic-candidate query). A timed-out query
runs ONCE (no best-of) and skips its remaining runs.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.plans import QUERIES  # noqa: E402
from cds_etl_spark.session import get_spark  # noqa: E402

RUNS = 2
TIMEOUT = float(os.environ.get("SWEEP_TIMEOUT", "90"))


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    names = sys.argv[3:] or list(QUERIES)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = open(out_path, "a") if out_path else sys.stdout

    def timed_save(w, group: str) -> tuple[float, bool]:
        """Run one save under a cancel watchdog; returns (sec, timed_out)."""
        sc = spark.sparkContext
        done = threading.Event()

        def watchdog():
            if not done.wait(TIMEOUT):
                sc.cancelJobGroup(group)

        t = threading.Thread(target=watchdog, daemon=True)
        sc.setJobGroup(group, group, interruptOnCancel=True)
        t.start()
        t0 = time.perf_counter()
        try:
            w.save()
            return time.perf_counter() - t0, False
        except Exception:
            # A cancelled job surfaces as a Py4J error; anything else
            # re-raises from the caller's warm run instead.
            if time.perf_counter() - t0 >= TIMEOUT - 1:
                return time.perf_counter() - t0, True
            raise
        finally:
            done.set()

    for name in names:
        rec: dict = {"name": name, "best": None, "runs": [], "err": None}
        try:
            spark.sparkContext.setJobDescription(f"sweep: {name}")
            w = (
                QUERIES[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
            )
            sec, timed_out = timed_save(w, f"sweep-{name}")  # warm
            if timed_out:
                rec["timeout"] = True
                rec["best"] = round(sec, 4)
            else:
                for _ in range(RUNS):
                    sec, timed_out = timed_save(w, f"sweep-{name}")
                    rec["runs"].append(round(sec, 4))
                    if timed_out:
                        rec["timeout"] = True
                        break
                rec["best"] = min(rec["runs"])
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rec["err"] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
        print(json.dumps(rec), file=out, flush=True)
        # Measurement hygiene (same as tools/qprof.py): checkpointed
        # queries leave localCheckpoint blocks persisted until the
        # DataFrame is GC'd; across a 401-query batch the accumulated
        # blocks evict each other and later queries pay disk reads +
        # GC churn that have nothing to do with their own cost. Drop
        # all persisted RDDs between queries.
        w = None
        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
