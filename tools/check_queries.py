"""Replicate the driver's correctness comparison locally."""
import sys, time
import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = e.queries()
oracle = e.oracle_sql()
only = sys.argv[1:] if len(sys.argv) > 1 else None

def to_df(res):
    import ray.data as rd
    import pyarrow as pa
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)

for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = to_df(fn(SF))
    except Exception as ex:
        print(f"{name:25s} ENGINE-FAIL {type(ex).__name__}: {str(ex)[:120]}")
        continue
    dt = time.time() - t0
    if name not in oracle:
        print(f"{name:25s} rows-only: {len(res)} rows, cols={list(res.columns)} ({dt:.1f}s)")
        continue
    gold = con.execute(oracle[name]).fetchdf()
    a, b = canon(res), canon(gold)
    ok_rows = len(a) == len(b)
    ok_cols = list(a.columns) == list(b.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            # check_dtype=True: the driver hashes raw values, so an
            # int64-vs-float64 difference fails its hash compare even when
            # values are numerically equal (VERDICT r1 "What's wrong" #1-2)
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            ok_vals = True
        except AssertionError as ex:
            msg = str(ex).split("\n")[0]
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
    print(f"{name:25s} {status} rows {len(a)}/{len(b)} cols_ok={ok_cols} ({dt:.1f}s)")
    if status != "OK":
        print("   engine cols:", list(a.columns), " oracle cols:", list(b.columns))
        if ok_rows and ok_cols:
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            print(a[bad].head(3)); print(b[bad].head(3))
ray.shutdown()
