#!/usr/bin/env python
"""Mechanical Window-cliff audit: list every ``Window.orderBy`` (global
— all rows in ONE task) and every ``Window.partitionBy(...).orderBy``
whose partition key matches a known LOW-CARDINALITY column, across the
plan files. The r9 round's task-5 audit found five corpus-scaling
global sorts this way (qs21/qs24/qs71/qs226/qs257 — 2.5–8.9× sf10
wins after rewiring onto operators/prefix.py machinery); run this
after adding queries so new cliffs are classified on arrival
(grid/dimension/epilogue-sized = fine; corpus-scaling = rewire or
record a measured reject in BASELINE.md).

Usage: python tools/window_audit.py
"""

from __future__ import annotations

import glob
import os
import re

#: Columns whose cardinality does NOT grow with the corpus — a window
#: partitioned on one of these over corpus-sized input is a task cliff.
LOW_CARD = (
    "prio",
    "o_orderpriority",
    "o_orderstatus",
    "l_returnflag",
    "l_linestatus",
    "c_mktsegment",
    "seg",
    "lang",
    "source",
    "event_type",
    "flag",
    "status",
    '"y"',
    '"g"',
    '"grp"',
    '"st"',
    '"b"',
)


def main() -> None:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    hits: list[tuple[str, int, str, str]] = []
    for path in sorted(glob.glob(os.path.join(root, "cds_etl_spark", "plans", "*.py"))):
        rel = os.path.relpath(path, root)
        for i, line in enumerate(open(path), 1):
            s = line.strip()
            if re.search(r"Window\.orderBy\(", s):
                hits.append((rel, i, "GLOBAL", s[:90]))
            elif re.search(r"Window\.partitionBy\(", s) and "orderBy" in s:
                m = re.search(r"partitionBy\(([^)]*)\)", s)
                keys = m.group(1) if m else ""
                if any(k in keys for k in LOW_CARD):
                    hits.append((rel, i, "LOW-CARD", s[:90]))
    for rel, i, kind, frag in hits:
        print(f"{kind:8} {rel}:{i}  {frag}")
    print(
        f"\n{len(hits)} candidate sites. Classify each by INPUT "
        "cardinality (grid/dimension/epilogue = fine; corpus-scaling "
        "= rewire via operators/prefix.py or record a measured "
        "reject) — the classification table lives in BASELINE.md "
        "('r9 task 5')."
    )


if __name__ == "__main__":
    main()
