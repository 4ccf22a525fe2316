"""Mimic the driver's exact-hash compare: run a query's Spark plan and
DuckDB oracle at a given sf, canonicalize both to pandas (columns sorted
by name, rows lexsorted), and report exact value diffs.

Usage: python tools/driver_diff.py qs48_time_range_frame [qs66 ...]
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
        sdf = QUERIES[full](spark, SF_DIR).toPandas()
        ddf = con.sql(ORACLE_SQL[full]).df()
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
        # dtype-only mismatch can still flip a hash (1 vs 1.0)
        for col in s.columns:
            if str(s[col].dtype) != str(d[col].dtype):
                print(
                    f"{full}: DTYPE col={col!r} spark={s[col].dtype} "
                    f"duck={d[col].dtype}"
                )
        if ndiff == 0:
            print(f"{full}: values EQUAL ({len(s)} rows)")
        else:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
