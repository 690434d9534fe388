#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the paired oracle SQL (oracle_sql.json) in DuckDB over views of the
same testdata parquet, sort columns by name and rows by all values, and
compare. Prints PASS/FAIL per query plus first diffs for failures.
"""
import json, sys, math
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    # Type-tag decimals: the driver's hash canon distinguishes DuckDB's
    # HUGEINT/decimal results (e.g. uncast SUM(BIGINT)) from Spark's int64,
    # and a plain str() would collapse Decimal(123) and 123 to "123".
    if isinstance(v, Decimal):
        return "decimal:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def normalize(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, x if x is not None else "") for x in t))
    return [names[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    npass = nfail = nrows_only = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            s_names = spark_tbl.column_names
            s_rows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
            # to_pylist gives dicts in schema order; rebuild tuples in column order
            s_rows = [tuple(d[c] for c in s_names) for d in spark_tbl.to_pylist()]
            o = con.execute(sql)
            o_names = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            nfail += 1
            continue
        sn, sr = normalize(s_names, s_rows)
        on, orows = normalize(o_names, o_rows)
        if sn != on:
            print(f"FAIL {name}: schema {sn} vs oracle {on}")
            nfail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL {name}: rows {len(sr)} vs oracle {len(orows)}")
            nfail += 1
            continue
        diffs = [(a, b) for a, b in zip(sr, orows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(sr)} row diffs; cols={sn}")
            for a, b in diffs[:3]:
                print(f"  spark : {a}")
                print(f"  oracle: {b}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            npass += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracles:
            continue
        if only and name not in only:
            continue
        n = pq.read_table(f"{out_dir}/{name}").num_rows
        status = "ROWS-ONLY-PASS" if n > 0 else "ROWS-ONLY-FAIL"
        print(f"{status} {name} ({n} rows)")
        nrows_only += 1
    print(f"\n{npass} pass, {nfail} fail, {nrows_only} rows-only")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
