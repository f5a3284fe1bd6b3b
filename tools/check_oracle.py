#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries()
entry AND its oracle_sql() through DuckDB on the same parquet, compare
row count + schema + order-insensitive values. Reports exact and
near-miss diffs so query/oracle pairs can be hardened before the
driver sees them.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [-q name ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"  [{name}] SCHEMA MISMATCH: got {sorted(got.columns)} want {sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"  [{name}] ROWCOUNT MISMATCH: got {len(got)} want {len(want)}")
        ok = False
    g, w = canon(got.copy()), canon(want.copy())
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            # The driver's hash is dtype-KIND-sensitive (round 1: DuckDB
            # SUM->HUGEINT->float64 vs engine int64 failed 9 queries with
            # bitwise-equal values, while int32-vs-int64 passed). Flag
            # kind drift (int vs float vs object) loudly.
            if gv.dtype.kind != wv.dtype.kind:
                print(f"  [{name}] col {c}: DTYPE KIND MISMATCH got {gv.dtype} "
                      f"want {wv.dtype} (driver hash WILL fail even if "
                      f"values match — cast the oracle)")
                ok = False
            if gv.dtype.kind in "fc" or wv.dtype.kind in "fc":
                gv = gv.astype(np.float64)
                wv = wv.astype(np.float64)
                both_nan = pd.isna(gv) & pd.isna(wv)
                eq = (gv == wv) | both_nan
                if not eq.all():
                    bad = ~eq
                    md = np.nanmax(np.abs(gv[bad] - wv[bad]))
                    print(f"  [{name}] col {c}: {bad.sum()} value diffs, max abs {md:.3e}")
                    ok = False
            else:
                eq = (gv == wv) | (pd.isna(gv) & pd.isna(wv))
                if not np.asarray(eq).all():
                    print(f"  [{name}] col {c}: {(~np.asarray(eq)).sum()} non-float diffs; "
                          f"e.g. got={gv[~np.asarray(eq)][:3]} want={wv[~np.asarray(eq)][:3]}")
                    ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{args.sf}/{t}.parquet'")

    names = args.queries or list(qs.keys())
    n_ok = n_bad = n_weak = 0
    for name in names:
        fn = qs[name]
        try:
            got = to_pandas(fn(args.sf))
        except Exception as e:
            print(f"[{name}] QUERY ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"[{name}] rows-only (no oracle): {len(got)} rows, cols {sorted(got.columns)}")
            n_weak += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[{name}] ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        if compare(name, got, want):
            print(f"[{name}] OK ({len(got)} rows)")
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_weak} rows-only")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
