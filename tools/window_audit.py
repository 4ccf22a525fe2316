#!/usr/bin/env python
"""Mechanical Window-cliff audit: list every ``Window.orderBy`` (global
— all rows in ONE task) and every ``Window.partitionBy(...).orderBy``
whose partition key matches a known LOW-CARDINALITY column, across the
plan files. The r9 round's task-5 audit found five corpus-scaling
global sorts this way (qs21/qs24/qs71/qs226/qs257 — 2.5–8.9× sf10
wins after rewiring onto operators/prefix.py machinery).

Since r10 the audit is a GATE, not a ritual:
``tests/test_window_audit.py`` fails when a site appears that is not
classified in ``tests/golden/window_sites.txt`` (or when a classified
site disappears), so new GLOBAL / LOW-CARD windows must be classified
on arrival — grid/dimension/epilogue-sized = fine; corpus-scaling =
rewire via operators/prefix.py or record a measured reject in
BASELINE.md.

Usage: python tools/window_audit.py          # list sites
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

_NAME_RE = re.compile(r'^\s*(?:"(qs\d+[a-z0-9_]*)"|def (qs\d+)\b)')
# A module-level helper def between queries must reset the enclosing-name
# key, or its Window sites get attributed to the PRECEDING query in the
# allowlist key — stable but misleading (r10 ADVICE).
_DEF_RE = re.compile(r"^def ([A-Za-z_]\w*)\b")


def find_sites(root: str | None = None) -> list[tuple[str, int, str, str, str]]:
    """Return (relpath, lineno, kind, enclosing-query, fragment) for
    every candidate window-cliff site in the plan files.

    ``enclosing-query`` is the nearest preceding registered query name
    (the ``@query("qs…")`` literal) — the stable classification key
    together with the normalized code fragment."""
    if root is None:
        root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    hits: list[tuple[str, int, str, str, str]] = []
    for path in sorted(
        glob.glob(os.path.join(root, "cds_etl_spark", "plans", "*.py"))
    ):
        rel = os.path.relpath(path, root)
        current = "<module>"
        for i, line in enumerate(open(path), 1):
            m = _NAME_RE.match(line)
            if m:
                current = m.group(1) or m.group(2)
            else:
                md = _DEF_RE.match(line)
                if md:
                    current = md.group(1)
            s = line.strip()
            if re.search(r"Window\.orderBy\(", s):
                hits.append((rel, i, "GLOBAL", current, s[:90]))
            elif re.search(r"Window\.partitionBy\(", s) and "orderBy" in s:
                m2 = re.search(r"partitionBy\(([^)]*)\)", s)
                keys = m2.group(1) if m2 else ""
                if any(k in keys for k in LOW_CARD):
                    hits.append((rel, i, "LOW-CARD", current, s[:90]))
    return hits


def site_key(hit: tuple[str, int, str, str, str]) -> str:
    """Line-number-free identity: kind|file|query|fragment."""
    rel, _i, kind, name, frag = hit
    return f"{kind}|{rel}|{name}|{frag}"


def main() -> None:
    hits = find_sites()
    for rel, i, kind, name, frag in hits:
        print(f"{kind:8} {rel}:{i}  [{name}]  {frag}")
    print(
        f"\n{len(hits)} candidate sites. Classification gate: "
        "tests/golden/window_sites.txt (tests/test_window_audit.py)."
    )


if __name__ == "__main__":
    main()
