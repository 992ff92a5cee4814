#!/usr/bin/env python3
"""Staged DuckDB oracle replay for deep CTE chains (r12 VERDICT #5).

Usage: python3 tools/staged_check.py <sfDir> <verifyOutDir> <query> [...]

DuckDB 1.0 inlines a non-MATERIALIZED CTE at every reference site, so
the e29 oracle — whose serve layers reference g3 three times and bk a
dozen times — re-expands the whole NN-descent chain per reference and
spilled past the box's 79 GB free disk at sf1 (SURVEY §17.10). This
runner splits the single `WITH a AS (...), b AS (...) SELECT ...` text
into `CREATE TEMP TABLE a AS ...` statements executed IN ORDER (the
same per-round materialization the Spark side does with
localCheckpoint), so the replay's working set is one stage, not the
expanded tree. Results are compared to the Spark parquet dump exactly
like tools/selfcheck.py — same canonicalization, same tolerances.

Only top-level CTEs are split; a nested WITH (e27/e28's base-graph
replay) stays inside its stage's body, where its single-reference CTEs
are harmless.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

from selfcheck import canon, compare


import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def split_ctes(sql: str):
    """Parse `WITH name AS (body), ... <final select>` at paren depth 0.

    Returns (list[(name, body)], final_select). The scanner is
    QUOTE-AWARE (a paren inside a '...' literal, '' escapes included,
    never moves the depth counter), and the parse is VALIDATED rather
    than trusted (r13 ADVICE: a mis-split executed wrong SQL instead
    of failing): SQL comments and WITH RECURSIVE are rejected up
    front, every CTE name must be a plain identifier, every body
    non-empty, and the final remainder must start with SELECT — a
    shape violation raises instead of silently staging wrong bodies.
    """
    s = sql.strip()
    assert s.upper().startswith("WITH"), "not a WITH query"
    assert "--" not in s and "/*" not in s, \
        "staged replay does not support SQL comments (they would blind the paren scanner)"
    assert not re.match(r"(?is)^WITH\s+RECURSIVE\b", s), \
        "WITH RECURSIVE cannot be staged as temp tables"

    def skip_literal(j):
        # s[j] == "'": return index just past the closing quote,
        # treating '' as an escaped quote
        j += 1
        while True:
            if s[j] == "'":
                if j + 1 < len(s) and s[j + 1] == "'":
                    j += 2
                    continue
                return j + 1
            j += 1

    i = len("WITH")
    ctes = []
    while True:
        # read `name AS (`
        head = ""
        while s[i] != "(":
            if s[i] == "'":
                raise ValueError(f"string literal where a CTE name was expected: ...{s[i:i+40]!r}")
            head += s[i]
            i += 1
        name = head.strip()
        if name.upper().endswith(" AS MATERIALIZED"):
            name = name[: -len(" AS MATERIALIZED")].strip()
        elif name.upper().endswith(" AS"):
            name = name[:-3].strip()
        assert _IDENT.match(name), f"CTE name is not a plain identifier: {name!r}"
        # balanced-paren body, skipping string literals
        depth = 0
        j = i
        while True:
            if s[j] == "'":
                j = skip_literal(j)
                continue
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = s[i + 1 : j]
        assert body.strip(), f"empty CTE body for {name}"
        ctes.append((name, body))
        i = j + 1
        while s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        final = s[i:]
        assert final.strip().upper().startswith("SELECT"), \
            f"final stage does not start with SELECT: {final[:60]!r}"
        return ctes, final


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ts_type = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
    if ts_type and ts_type[0] == 'BIGINT':
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{sf_dir}/events.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in names:
        sql = oracle[name]
        try:
            ctes, final = split_ctes(sql)
            for i, (cte, body) in enumerate(ctes):
                con.execute(f"CREATE OR REPLACE TEMP TABLE {cte} AS {body}")
                n = con.execute(f"SELECT count(*) FROM {cte}").fetchone()[0]
                print(f"  stage {i + 1}/{len(ctes)} {cte}: {n} rows", flush=True)
            exp = con.execute(final).fetchdf()
            for cte, _ in ctes:
                con.execute(f"DROP TABLE IF EXISTS {cte}")
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            err = compare(name, canon(got), canon(exp))
        except Exception as e:
            err = f"EXCEPTION {e}"
        if err:
            n_bad += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name} ({len(exp)} rows, staged)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
