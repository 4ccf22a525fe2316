"""Physical-plan shape regression guard (tools/plan_snapshot.py).

Correctness tests can't see a lost broadcast or a new Exchange — the
answers stay right while the scale plan degrades. This test compares
the normalized plan shapes of a representative query set against the
committed golden file; an INTENTIONAL plan change is re-frozen with

    python tools/plan_snapshot.py --update

so every plan change is an explicit, reviewable diff.
"""

import os


def test_plan_shapes_match_golden(spark):
    import tools.plan_snapshot as ps

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "plan_shapes.txt"
    )
    with open(golden_path) as fh:
        golden = fh.read()
    current = ps.build_snapshot(spark, "/root/testdata/sf0.01")

    if current != golden:
        g = dict(
            b.split("\n", 1)
            for b in ("\n" + golden.strip()).split("\n=== ")
            if b
        )
        c = dict(
            b.split("\n", 1)
            for b in ("\n" + current.strip()).split("\n=== ")
            if b
        )
        diffs = [k for k in c if g.get(k) != c[k]]
        raise AssertionError(
            "plan shape drift in: "
            + ", ".join(diffs)
            + " — if intentional, run `python tools/plan_snapshot.py"
            " --update` and commit the diff\n"
            + "\n".join(
                f"--- {k} golden ---\n{g.get(k)}\n"
                f"--- {k} current ---\n{c[k]}"
                for k in diffs[:2]
            )
        )
