#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over the raw
testdata parquet, load the Spark result parquet, sort columns by name,
sort rows, compare (exact for non-floats, 1e-9 relative for floats).
"""
import json, sys, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == 'f' or b[c].dtype.kind == 'f':
            for x, y in zip(av, bv):
                if pd.isna(x) and pd.isna(y):
                    continue
                if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                    return f"col {c}: {x} != {y}"
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                bad = [(x, y) for x, y in zip(av, bv) if str(x) != str(y)][:3]
                return f"col {c}: mismatches {bad}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # ScaleUp-synthesized layouts write events.ts as BIGINT nanos
    # (Spark cannot author TIMESTAMP(NANOS) parquet); rebind it as a
    # microsecond timestamp so the events-family oracles run at sf1
    # too. Driver testdata (real TIMESTAMP_NS) is untouched.
    ts_type = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
    if ts_type and ts_type[0] == 'BIGINT':
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{sf_dir}/events.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            err = compare(name, canon(got), canon(exp))
        except Exception as e:
            err = f"EXCEPTION {e}"
        if err:
            n_bad += 1
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(exp)} rows)")
    # queries without oracle: rows-only
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = sum(pd.read_parquet(f).shape[0] for f in files)
            print(f"rows-only {d}: {n} rows")
    print(f"\n{n_ok} ok, {n_bad} fail")
    return n_bad

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
