#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [query ...]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already produced
<out_dir>/<name>/ parquet dirs + oracle_sql.json. Runs each oracle SQL in
DuckDB over views of the sf parquet tables, then compares (columns sorted
by name, rows sorted, values canonicalized; floats rounded to 6dp as a
safety net — the queries themselves are engineered to be bit-deterministic).
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return f"{round(v, 6):.6f}"
    if isinstance(v, decimal.Decimal):
        return f"{round(float(v), 6):.6f}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalars
        return canon(v.item())
    return str(v)


def frame_to_rows(df):
    df = df[sorted(df.columns)]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return sorted(df.columns), rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    n_pass, fails = 0, []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark result written"))
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            fails.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            continue
        gc, gr = frame_to_rows(got)
        ec, er = frame_to_rows(exp)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            fails.append((name, f"columns differ: spark={gc} duckdb={ec}"))
            continue
        if len(gr) != len(er):
            fails.append((name, f"row count: spark={len(gr)} duckdb={len(er)}"))
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            fails.append((name, f"{len(bad)}/{len(gr)} rows differ; first: spark={bad[0][0]} duckdb={bad[0][1]}"))
            continue
        n_pass += 1
        print(f"PASS {name} ({len(gr)} rows)")

    for name, why in fails:
        print(f"FAIL {name}: {why}")
    print(f"\n{n_pass} passed, {len(fails)} failed")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
