#!/usr/bin/env python
"""Full-registry differential sweep across perturbation fixtures.

The r14 lesson: a formula wrong the same way in the Spark plan and the
DuckDB oracle stays green on the contract fixture forever — but a
fixture with a DIFFERENT distribution can fire the latent branch (the
zipf content axis exposed qs293's NULL-struct COUNT and qs337's −0.0
in one run). This tool runs tools/driver_diff.py --all against each
fixture directory given (or the standard four-axis matrix) and prints
one summary line per fixture.

Usage: python tools/fixture_matrix.py [--jobs=N] [sf_dir ...]
(--jobs=N sweeps N fixtures concurrently, splitting the CPUs between
their engine sessions — correctness is conf-independent.)
Default matrix (generates what is missing):
  /root/testdata/sf0.01          (driver contract)
  /root/testdata/sf0.001         (degenerate-group axis)
  gen sf0.01 doc_vocab=zipf      (content axis)
  gen_skew sf0.01                (hot-key shuffle axis)
  gen_permute sf0.01             (physical-layout axis, r14 — found
                                  qs33's tie-dependent LIMIT cutoff)
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
GEN_ROOT = "/tmp/cds_etl_spark_wh/gen"
SKEW_ROOT = "/tmp/cds_etl_spark_wh/skew"
PERMUTE_ROOT = "/tmp/cds_etl_spark_wh/permute"


def _ensure_default_fixtures() -> list[str]:
    dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    zipf = os.path.join(GEN_ROOT, "sf0.01-zipf")
    if not os.path.exists(os.path.join(zipf, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "gen_sf.py"),
             "0.01", GEN_ROOT, "zipf"],
            check=True,
        )
    dirs.append(zipf)
    skew = os.path.join(SKEW_ROOT, "sf0.01")
    if not os.path.exists(os.path.join(skew, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "gen_skew.py"),
             "0.01", SKEW_ROOT],
            check=True,
        )
    dirs.append(skew)
    permute = os.path.join(PERMUTE_ROOT, "sf0.01")
    if not os.path.exists(os.path.join(permute, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "gen_permute.py"),
             "/root/testdata/sf0.01", permute],
            check=True,
        )
    dirs.append(permute)
    return dirs


def _sweep(d: str, cpus: str | None) -> tuple[str, str, int]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=d)
    if cpus:
        # Concurrent sessions split the machine instead of each
        # grabbing local[32]; correctness is conf-independent (the
        # perturbed sweep runs the window at local[4]/partitions=3).
        env["SPARK_GRAFT_CPUS"] = cpus
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "driver_diff.py"), "--all"],
        env=env,
        capture_output=True,
        text=True,
    )
    return d, out.stdout + out.stderr, out.returncode


def main() -> int:
    args = sys.argv[1:]
    jobs = 1
    if args and args[0].startswith("--jobs="):
        jobs = int(args[0].split("=", 1)[1])
        args = args[1:]
    dirs = args or _ensure_default_fixtures()
    rc = 0
    if jobs > 1:
        from concurrent.futures import ThreadPoolExecutor

        cpus = str(max(4, (os.cpu_count() or 8) // jobs))
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            results = list(ex.map(lambda d: _sweep(d, cpus), dirs))
    else:
        results = [_sweep(d, None) for d in dirs]
    for d, text, code in results:
        n_eq = text.count("values EQUAL")
        bad = [
            ln
            for ln in text.splitlines()
            if any(k in ln for k in
                   ("ndiff", "FAIL", "COLS ", "ROWS spark", "CANON"))
            and "width-only" not in ln
        ]
        status = "OK" if not bad and code == 0 else "FINDINGS"
        if bad or code != 0:
            # rc must track the status line, not just printed finding
            # lines — a startup traceback with no matching keyword
            # would otherwise yield [FINDINGS] but exit 0 (ADVICE r14).
            rc = 1
        print(f"{d}: {n_eq} EQUAL, {len(bad)} finding(s) [{status}]")
        for ln in bad[:20]:
            print(f"  {ln.strip()}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
