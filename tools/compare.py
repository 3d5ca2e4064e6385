#!/usr/bin/env python3
"""Dev-loop oracle checker (driver-side tooling only, not engine code).

Predicts the driver's correctness gate by replaying BOTH of its read paths
exactly (diagnosed in VERDICT r4 "What's wrong" #1-3):

  * the Spark result parquet is read with ``pandas.read_parquet`` — DECIMAL
    columns arrive as Python ``Decimal`` objects, ARRAY columns as numpy
    arrays (which crash ``sort_values``, the driver's observed ``err``);
  * the DuckDB oracle is materialized via ``.df()`` — every DECIMAL becomes
    float64, HUGEINT becomes float64/object.

Rows are sorted in pandas over all columns (sorted by name), then every cell
is canonicalized to a string WITH NO ROUNDING — ``Decimal('8784.30')`` and
``8784.3`` deliberately do NOT match, exactly like the driver's hash. A query
is green here iff it is green in CORRECTNESS_r{N}.json.

Usage: python3 tools/compare.py <sfDir> <outDir> [only,names]
"""
import datetime
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Canonical string for one value — type-sensitive, no rounding."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip rendering; py3 str==repr
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts is pd.NaT:
            return "<NULL>"
        # DATE columns read via pandas are datetime.date; via DuckDB .df()
        # they are midnight datetime64 — the driver treats those as equal
        # (its date-output queries are green), so render midnight as a date
        return ts.date().isoformat() if ts == ts.normalize() else ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    # numpy scalars (int64, bool_, float64) stringify like their python twins;
    # Decimal stringifies with its trailing zeros (that is the point)
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass  # arrays etc. — let str() show them (driver crashes earlier)
    return str(v)


def canon_frame(df):
    """Driver order: columns sorted by (lowercased) name, rows sorted over
    all columns in pandas — the same call that raises TypeError on
    numpy-array cells in the driver."""
    df = df.rename(columns={c: c.lower() for c in df.columns})
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, na_position="last", kind="mergesort")
    return cols, [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            bad.append((name, f"SPARK READ ERROR: {e}"))
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            bad.append((name, f"ORACLE ERROR: {e}"))
            continue
        try:
            s_cols, s_rows = canon_frame(spark_df)
            o_cols, o_rows = canon_frame(oracle_df)
        except Exception as e:
            bad.append((name, f"CANON ERROR (driver would err too): {type(e).__name__}: {e}"))
            continue
        if s_cols != o_cols:
            bad.append((name, f"COLS spark={s_cols} oracle={o_cols}"))
            continue
        if len(s_rows) != len(o_rows):
            bad.append((name, f"ROWS spark={len(s_rows)} oracle={len(o_rows)}"))
            continue
        mism = [(i, x, y) for i, (x, y) in enumerate(zip(s_rows, o_rows)) if x != y]
        if mism:
            i, x, y = mism[0]
            bad.append((name, f"VALUES {len(mism)}/{len(s_rows)} differ; first @{i}:\n"
                              f"  spark : {x}\n  oracle: {y}"))
        else:
            ok.append(name)
    for n in ok:
        print(f"PASS {n}")
    for n, msg in bad:
        print(f"FAIL {n}: {msg}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
