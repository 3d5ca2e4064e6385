#!/usr/bin/env python3
"""Dev-loop oracle checker (driver-side tooling only, not engine code).

Mimics the driver's correctness gate: reads each query result parquet from
`outDir`, runs the corresponding oracle SQL in DuckDB over the testdata
parquet tables, sorts columns by name and rows by value, and compares.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if False else v
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            res = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in res.columns]
            spark_rows = res.fetchall()
            o = con.sql(sql)
            o_cols = [c.lower() for c in o.columns]
            o_rows = o.fetchall()
        except Exception as e:
            bad.append((name, f"EXEC ERROR: {e}"))
            continue
        if sorted(spark_cols) != sorted(o_cols):
            bad.append((name, f"COLS spark={sorted(spark_cols)} oracle={sorted(o_cols)}"))
            continue
        # the driver's hash covers physical types too (BIGINT vs HUGEINT,
        # DECIMAL(28,x) vs DECIMAL(38,x) fail it even when values match)
        s_types = dict(zip(spark_cols, [str(t) for t in res.types]))
        o_types = dict(zip(o_cols, [str(t) for t in o.types]))
        tmism = {c: (s_types[c], o_types[c]) for c in s_types if s_types[c] != o_types[c]}
        if tmism:
            bad.append((name, f"TYPES differ: {tmism}"))
            continue
        a, b = canon(spark_rows, spark_cols), canon(o_rows, o_cols)
        if len(a) != len(b):
            bad.append((name, f"ROWS spark={len(a)} oracle={len(b)}"))
            continue
        mism = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if mism:
            i, x, y = mism[0]
            bad.append((name, f"VALUES {len(mism)}/{len(a)} differ; first @{i}:\n  spark : {x}\n  oracle: {y}"))
        else:
            ok.append(name)
    for n in ok:
        print(f"PASS {n}")
    for n, msg in bad:
        print(f"FAIL {n}: {msg}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
