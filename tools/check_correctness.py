"""Local replica of the driver's correctness gate: run every
queries() entry and its oracle_sql() side-by-side on a testdata sf dir
and compare row count + sorted-row values.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw_got = to_pandas(fn(sf_dir))
            got = normalize(raw_got)
        except Exception as e:
            print(f"FAIL  {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        t0 = time.time()
        raw_exp = con.execute(oracles[name]).fetchdf()
        exp = normalize(raw_exp)
        dto = time.time() - t0
        # the DRIVER's hash does not normalize dtypes — a DuckDB
        # HUGEINT vs engine int64 mismatch passes here but hash-fails
        # there (r3's copurchase_degree_histogram). Surface it loudly.
        dtype_warn = [
            c for c in raw_got.columns if c in raw_exp.columns
            and raw_got[c].dtype != raw_exp[c].dtype]
        if dtype_warn:
            print(f"WARN  {name}: raw dtype mismatch vs oracle on "
                  f"{dtype_warn} — likely a driver hash-FAIL; CAST the "
                  f"oracle column(s)")
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS  {name}: {len(got)} rows (ray {dt:.1f}s, sql {dto:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}; "
                  f"cols {list(got.columns)} vs {list(exp.columns)}"
                  + ("" if not (ok_rows and ok_cols) else f"; values: {msg}"))
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
