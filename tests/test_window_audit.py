"""Window-cliff allowlist gate (r10, verdict task 6).

``tools/window_audit.py`` mechanically lists every global
``Window.orderBy`` and every low-cardinality
``partitionBy(...).orderBy`` site in the plan files — the shapes that
put a corpus-sized row set into one task. The r9 audit classified all
of them (five corpus-scaling cliffs were rewired with 2.5–8.9× sf10
wins); this test makes that discipline permanent: a NEW site must be
added to ``tests/golden/window_sites.txt`` with a class + note
(GRID / EPILOGUE / HIGH-CARD = safe; REJECT = measured reject recorded
in BASELINE.md), and a REMOVED site must be deleted from it — both
directions fail loudly instead of rotting.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from window_audit import find_sites, site_key  # noqa: E402

GOLDEN = os.path.join(HERE, "golden", "window_sites.txt")
ALLOWED_CLASSES = {"GRID", "EPILOGUE", "HIGH-CARD", "REJECT", "REWIRED"}


def _golden() -> dict[str, tuple[str, str]]:
    out: dict[str, tuple[str, str]] = {}
    for line in open(GOLDEN):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        kind, rel, name, frag, cls, note = line.split("|", 5)
        out[f"{kind}|{rel}|{name}|{frag}"] = (cls, note)
    return out


def test_every_window_site_is_classified():
    golden = _golden()
    found = {site_key(h): h for h in find_sites(ROOT)}

    unclassified = sorted(set(found) - set(golden))
    assert not unclassified, (
        "New Window-cliff candidate site(s) — classify each in "
        f"{GOLDEN} (class|note; REJECT needs a BASELINE.md "
        f"measurement):\n" + "\n".join(unclassified)
    )

    stale = sorted(set(golden) - set(found))
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


def test_golden_notes_nonempty():
    empty = [k for k, (_c, note) in _golden().items() if not note.strip()]
    assert not empty, f"classification note required: {empty}"
