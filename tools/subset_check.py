#!/usr/bin/env python3
"""Dev-loop oracle compare for a SUBSET of queries.

Usage: python3 tools/subset_check.py <sfDir> <verifyOutDir> [name ...]

Same canon/compare as tools/selfcheck.py, but only replays the named
queries (default: every query that has a parquet dump under
<verifyOutDir>), so an iteration on one operator doesn't pay the full
254-oracle DuckDB sweep.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

from selfcheck import canon, compare


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ts_type = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
    if ts_type and ts_type[0] == 'BIGINT':
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{sf_dir}/events.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = [d for d in sorted(os.listdir(out_dir))
                 if os.path.isdir(f"{out_dir}/{d}")]
    n_ok = n_bad = 0
    for name in names:
        if name not in oracle:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            n = sum(pd.read_parquet(f).shape[0] for f in files)
            print(f"rows-only {name}: {n} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
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
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
