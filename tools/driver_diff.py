"""Mimic the driver's exact-hash compare: run a query's Spark plan and
DuckDB oracle at a given sf, canonicalize both to pandas (columns sorted
by name, rows lexsorted), and report exact value diffs.

Usage: python tools/driver_diff.py qs48_time_range_frame [qs66 ...]
       python tools/driver_diff.py --all        # full registry sweep

Strict since r9: kind-level dtype divergence (int vs float — the
DuckDB HUGEINT class) and sign-of-zero (-0.0) FAIL; width-only
integer divergence is a note (driver-proven benign).
"""

from __future__ import annotations

import datetime
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_etl_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from cds_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # The driver's canonicalizer treats Spark `date` and DuckDB
    # `timestamp` columns as the same calendar value; mirror that here
    # (qs85 graded green in r02 while this tool reported a DTYPE diff).
    for col in df.columns:
        v = df[col]
        if str(v.dtype).startswith("datetime64"):
            df[col] = (
                pd.to_datetime(v).dt.tz_localize(None).astype("datetime64[us]")
            )
        elif v.dtype == object and v.map(
            lambda x: x is None
            or (
                isinstance(x, datetime.date)
                and not isinstance(x, datetime.datetime)
            )
        ).all() and v.notna().any():
            df[col] = pd.to_datetime(v).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(names: list[str]) -> int:
    if names == ["--all"]:
        names = list(QUERIES)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    rc = 0
    for name in names:
        if name in QUERIES:
            full = name
        else:
            cands = [q for q in QUERIES if q.startswith(name)]
            if len(cands) != 1:
                print(f"{name}: {'AMBIGUOUS' if cands else 'UNKNOWN'} "
                      f"prefix, candidates={cands}")
                rc = 1
                continue
            full = cands[0]
        try:
            sdf = QUERIES[full](spark, SF_DIR).toPandas()
            ddf = con.sql(ORACLE_SQL[full]).df()
        except Exception as exc:  # noqa: BLE001 — a sweep must not
            # die on query N and silently hide N+1..end (the r15
            # NULL-axis sweep aborted at an oracle malformed-JSON
            # error with 378 queries unswept).
            first = str(exc).splitlines()[0] if str(exc) else repr(exc)
            print(f"{full}: EXEC FAIL {type(exc).__name__}: {first}")
            rc = 1
            continue
        try:
            s = _canon(sdf)
            d = _canon(ddf)
        except TypeError as exc:
            print(f"{full}: CANON ERROR {exc}")
            rc = 1
            continue
        if list(s.columns) != list(d.columns):
            print(f"{full}: COLS spark={list(s.columns)} duck={list(d.columns)}")
            rc = 1
            continue
        if len(s) != len(d):
            print(f"{full}: ROWS spark={len(s)} duck={len(d)}")
            rc = 1
            continue
        ndiff = 0
        for col in s.columns:
            sv, dv = s[col], d[col]
            # exact compare incl. dtype-level repr like a hash would see
            neq = ~(
                (sv.isna() & dv.isna())
                | (sv.astype(object) == dv.astype(object))
            )
            if neq.any():
                idx = list(neq[neq].index[:5])
                ndiff += int(neq.sum())
                print(
                    f"{full}: col={col!r} dtypes=({sv.dtype},{dv.dtype}) "
                    f"ndiff={int(neq.sum())}"
                )
                for i in idx:
                    print(f"   row{i}: spark={sv[i]!r} duck={dv[i]!r}")
        # STRICT (r9): KIND-level dtype divergence IS a failure — the
        # driver hashes the pandas rendering, so int64 `6437750` vs
        # float64 `6437750.0` hashes red even when every value compares
        # equal (the qs210/qs308 r8 defect class: DuckDB SUM(BIGINT) →
        # HUGEINT → float64). Width/signedness-only divergence
        # (int32/int64/uint32) renders identically and is driver-proven
        # benign (qs87/qs189/qs190/qs203/qs208/qs209/qs217 all graded
        # green with exactly that mismatch) — note it, don't fail.
        for col in s.columns:
            sk = s[col].dtype.kind.replace("u", "i")
            dk = d[col].dtype.kind.replace("u", "i")
            if sk != dk:
                print(
                    f"{full}: DTYPE FAIL col={col!r} spark={s[col].dtype} "
                    f"duck={d[col].dtype}"
                )
                ndiff += 1
            elif str(s[col].dtype) != str(d[col].dtype):
                print(
                    f"{full}: dtype note col={col!r} spark={s[col].dtype} "
                    f"duck={d[col].dtype} (width-only; hashes equal)"
                )
        # STRICT (r9): IEEE sign-of-zero divergence IS a failure —
        # `-0.0 == 0.0` is True so the value compare above masks it, but
        # the driver's hash sees the rendering (the qs248 r8 defect).
        # Any -0.0 PRESENT on either side is also flagged: whether the
        # other engine matches the sign can flip with summation order.
        import numpy as np  # local: only float columns need it

        for col in s.columns:
            sv, dv = s[col], d[col]
            if sv.dtype.kind == "f" and dv.dtype.kind == "f":
                szero = np.signbit(sv.to_numpy()) & (sv.to_numpy() == 0.0)
                dzero = np.signbit(dv.to_numpy()) & (dv.to_numpy() == 0.0)
                bad = szero != dzero
                if bad.any():
                    print(
                        f"{full}: SIGNZERO FAIL col={col!r} "
                        f"nmismatch={int(bad.sum())}"
                    )
                    ndiff += int(bad.sum())
                elif szero.any() or dzero.any():
                    print(
                        f"{full}: SIGNZERO FAIL col={col!r} -0.0 present "
                        f"(spark={int(szero.sum())} duck={int(dzero.sum())})"
                        " — canonicalize with `+ 0.0` after ROUND"
                    )
                    ndiff += 1
        if ndiff == 0:
            print(f"{full}: values EQUAL ({len(s)} rows)")
        else:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
