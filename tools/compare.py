#!/usr/bin/env python3
"""Dev-loop oracle checker (driver-side tooling only, not engine code).

Predicts the driver's correctness gate by replaying BOTH of its read paths
exactly (diagnosed in VERDICT r4 "What's wrong" #1-3):

  * the Spark result parquet is read with ``pandas.read_parquet`` — DECIMAL
    columns arrive as Python ``Decimal`` objects, ARRAY columns as numpy
    arrays (which crash ``sort_values``, the driver's observed ``err``);
  * the DuckDB oracle is materialized via ``.df()`` — every DECIMAL becomes
    float64, HUGEINT becomes float64/object.

FULL mode (default): rows are sorted in pandas over all columns (sorted by
name), then every cell is canonicalized to a string WITH NO ROUNDING —
``Decimal('8784.30')`` and ``8784.3`` deliberately do NOT match, exactly
like the driver's hash. A query is green here iff it is green in
CORRECTNESS_r{N}.json.

FAST mode (``--fast``): the full mode's per-cell python canonicalization +
multi-column object sort cost ~3 h at sf0.1 (11.6M-row tfidf/bm25 frames).
Fast mode covers EVERY row and EVERY column but vectorizes: each column is
canonicalized with pandas column ops (same equivalences the driver's
compare exhibits on green queries — midnight timestamps render as dates,
integer widths collapse, float NULL and NaN both render NaN), rows are
joined into one string Series, and the two sides compare as an
ORDER-INDEPENDENT MULTISET DIGEST (count + sum + xor of per-row hashes) —
no sort. Any fast-mode mismatch is automatically RE-CHECKED in full mode,
so a reported FAIL always carries the driver-exact diagnosis and the only
divergence risk is a fast-PASS/full-FAIL (see ``--crosscheck``, which runs
both modes and compares verdicts).

PARALLEL (``--jobs N``): queries are independent (own parquet read, own
oracle SQL), so the sweep wall clock is dominated by the one or two giant
DuckDB replays (the ingest-loop oracles) running SERIALLY with everything
queued behind them. --jobs runs N worker processes, each with its own
DuckDB connection (threads capped to cores/N so workers don't
oversubscribe); verdict semantics are untouched.

ORACLE CACHE (default on, ``--no-cache`` to disable): the r12 sf0.1 sweep
wall was 100% bounded by three DuckDB replays (q_dedup_clusters 2993 s)
whose oracle SQL and input parquet almost never change between sweeps. The
ORACLE result frame (never the Spark side, which is what's under test) is
pickled under tools/.oracle_cache keyed on sha256(query name, oracle SQL,
duckdb version, pandas major, and the (size, mtime) fingerprint of every
input table in sfDir) — touching the oracle SQL or regenerating testdata
changes the key and forces a fresh replay. Pickle (not parquet) so the
cached frame round-trips with the EXACT dtypes ``.df()`` produced
(Decimal objects, HUGEINT floats) — byte-identical verdicts by
construction. Cache hits print "(cached)".

CROSSCHECK SAMPLE (``--crosscheck-sample N``): full --crosscheck runs both
modes on everything; the sample picks N queries deterministically spread
over the sorted query list and crosschecks just those, so every sweep
continuously guards against fast/full canonicalization drift at the sweep's
own scale without the full double-compare cost.

Usage: python3 tools/compare.py <sfDir> <outDir> [--only a,b] [--fast]
       [--crosscheck] [--crosscheck-sample N] [--jobs N] [--no-cache]
       [--clear-cache]
"""
import argparse
import datetime
import hashlib
import json
import math
import multiprocessing
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".oracle_cache")

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


# ------------------------------------------------------------- fast mode

def fast_canon_col(s):
    """Vectorized canonical string Series for one column, matching the
    equivalences full mode exhibits on green queries:
      * datetime64: midnight -> date iso (the DATE-vs-midnight collapse),
        else full iso; NaT -> <NULL>
      * float: pandas astype(str) is shortest-repr; NaN stays 'nan' on BOTH
        sides (full mode renders float NULLs as NaN too — both read paths
        deliver them as NaN)
      * int/bool: width-insensitive decimal string
      * object (str / date / Decimal / None): per-cell cell() — unavoidable,
        but object columns are strings/dates, far cheaper than sorting
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        # tz-aware: convert to UTC and drop the tz ON THE SERIES (r12 ADVICE:
        # .values already yields naive UTC, so tz_localize(None) on it raised
        # TypeError and silently demoted every tz-aware column to slow mode)
        s = s.dt.tz_convert(None) if getattr(s.dtype, "tz", None) else s
        iso = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        date = s.dt.strftime("%Y-%m-%d")
        out = date.where(s == s.dt.normalize(), iso)
        return out.fillna("<NULL>").astype(str)
    if pd.api.types.is_float_dtype(s):
        return pd.Series(s.astype(float).values.astype(str), index=s.index)
    if pd.api.types.is_bool_dtype(s) or pd.api.types.is_integer_dtype(s):
        if s.isna().any():
            return s.map(cell)
        return s.astype(str)
    return s.map(cell)


def fast_digest(df):
    """(columns, row_count, multiset digest) without sorting: canonical
    per-column strings -> one joined string per row -> uint64 row hashes ->
    (count, sum mod 2^64, xor). Order-independent, every row and column
    contributes."""
    df = df.rename(columns={c: c.lower() for c in df.columns})
    cols = sorted(df.columns)
    n = len(df)
    if n == 0 or not cols:
        return cols, n, (n, 0, 0)
    canon = [fast_canon_col(df[c]).reset_index(drop=True) for c in cols]
    joined = canon[0]
    if len(canon) > 1:
        joined = joined.str.cat(canon[1:], sep="\x1f")
    h = pd.util.hash_pandas_object(joined, index=False).values
    return cols, n, (n, int(np.sum(h, dtype=np.uint64)), int(np.bitwise_xor.reduce(h)))


def compare_one(name, spark_df, oracle_df, fast):
    """None if PASS, else failure message. Fast mode falls back to the full
    driver-exact compare on ANY mismatch, so FAIL diagnoses (and verdicts on
    the FAIL side) are always full-mode."""
    if fast:
        try:
            s_cols, s_n, s_dig = fast_digest(spark_df)
            o_cols, o_n, o_dig = fast_digest(oracle_df)
            if s_cols == o_cols and s_n == o_n and s_dig == o_dig:
                return None
        except Exception:
            pass  # odd shapes (arrays in object cells, ...) -> full mode
        return compare_one(name, spark_df, oracle_df, fast=False)
    try:
        s_cols, s_rows = canon_frame(spark_df)
        o_cols, o_rows = canon_frame(oracle_df)
    except Exception as e:
        return f"CANON ERROR (driver would err too): {type(e).__name__}: {e}"
    if s_cols != o_cols:
        return f"COLS spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return f"ROWS spark={len(s_rows)} oracle={len(o_rows)}"
    mism = [(i, x, y) for i, (x, y) in enumerate(zip(s_rows, o_rows)) if x != y]
    if mism:
        i, x, y = mism[0]
        return (f"VALUES {len(mism)}/{len(s_rows)} differ; first @{i}:\n"
                f"  spark : {x}\n  oracle: {y}")
    return None


_W = {}  # per-worker state (connection, dirs, mode)


def _testdata_fingerprint(sf_dir):
    """(table, size, mtime_ns) for every input table — regenerated testdata
    invalidates every cached oracle for that sfDir."""
    fp = []
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        try:
            st = os.stat(p)
            fp.append((t, st.st_size, st.st_mtime_ns))
        except OSError:
            fp.append((t, -1, -1))
    return fp


def _init_worker(sf_dir, out_dir, fast, crosscheck, jobs, cache, sample):
    con = duckdb.connect()
    threads = max(1, (os.cpu_count() or 8) // max(1, jobs))
    con.sql(f"SET threads TO {threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _W.update(con=con, out_dir=out_dir, fast=fast, crosscheck=crosscheck,
              cache=cache, sample=sample or set(),
              fingerprint=_testdata_fingerprint(sf_dir))


def _oracle_df(name, sql):
    """DuckDB oracle frame, from the cache when the (sql, testdata, engine
    versions) key matches a prior replay. Only SUCCESSFUL replays are cached;
    writes are atomic (tmp + rename) so parallel workers never read a torn
    pickle."""
    if not _W["cache"]:
        return _W["con"].sql(sql).df(), False
    key = hashlib.sha256(json.dumps(
        [name, sql, duckdb.__version__, pd.__version__.split(".")[0],
         _W["fingerprint"]], default=str).encode()).hexdigest()[:24]
    path = os.path.join(CACHE_DIR, f"{name}-{key}.pkl")
    if os.path.exists(path):
        try:
            return pd.read_pickle(path), True
        except Exception:
            pass  # torn/incompatible pickle -> replay fresh below
    df = _W["con"].sql(sql).df()
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        df.to_pickle(tmp)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is an optimization; never fail the verdict for it
    return df, False


def _run_one(item):
    """(name, sql) -> (name, msg_or_None, disagree_msg_or_None, seconds,
    cached)."""
    name, sql = item
    t0 = time.time()
    try:
        spark_df = pd.read_parquet(f"{_W['out_dir']}/{name}")
    except Exception as e:
        return name, f"SPARK READ ERROR: {e}", None, time.time() - t0, False
    try:
        oracle_df, cached = _oracle_df(name, sql)
    except Exception as e:
        return name, f"ORACLE ERROR: {e}", None, time.time() - t0, False
    disagree = None
    if _W["crosscheck"] or name in _W["sample"]:
        f_msg = compare_one(name, spark_df, oracle_df, fast=True)
        g_msg = compare_one(name, spark_df, oracle_df, fast=False)
        if (f_msg is None) != (g_msg is None):
            disagree = (f"fast={'PASS' if f_msg is None else 'FAIL'} "
                        f"full={'PASS' if g_msg is None else 'FAIL'}")
        msg = g_msg  # full mode is the verdict of record
    else:
        msg = compare_one(name, spark_df, oracle_df, fast=_W["fast"])
    return name, msg, disagree, time.time() - t0, cached


def main(sf_dir, out_dir, only=None, fast=False, crosscheck=False, jobs=1,
         cache=True, crosscheck_sample=0):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    items = [(n, s) for n, s in sorted(oracles.items())
             if not only or n in only]
    # deterministic spread over the sorted list: same queries every sweep
    # until the query set changes, covering the alphabet ends and middle
    sample = set()
    if crosscheck_sample > 0 and items:
        step = max(1, len(items) // crosscheck_sample)
        sample = {items[i][0] for i in range(0, len(items), step)}
    ok, bad, disagree, n_cached = [], [], [], 0

    def handle(result):
        nonlocal n_cached
        name, msg, dis, took, cached = result
        n_cached += 1 if cached else 0
        note = " (cached)" if cached else ""
        if msg is None:
            ok.append(name)
            print(f"PASS {name} ({took:.1f}s){note}", flush=True)
        else:
            bad.append((name, msg))
            print(f"FAIL {name}: {msg}{note}", flush=True)
        if dis:
            disagree.append((name, dis))

    if jobs <= 1:
        _init_worker(sf_dir, out_dir, fast, crosscheck, 1, cache, sample)
        for it in items:
            handle(_run_one(it))
    else:
        with multiprocessing.Pool(
                jobs, initializer=_init_worker,
                initargs=(sf_dir, out_dir, fast, crosscheck, jobs, cache,
                          sample)) as pool:
            for result in pool.imap_unordered(_run_one, items):
                handle(result)
    for n, msg in bad:
        print(f"FAIL {n}: {msg}")
    if crosscheck or sample:
        for n, msg in disagree:
            print(f"DISAGREE {n}: {msg}")
        scope = "all" if crosscheck else f"sampled {sorted(sample)}"
        print(f"crosscheck ({scope}): {len(disagree)} fast/full verdict disagreements")
    if cache:
        print(f"oracle cache: {n_cached}/{len(items)} hits")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad or disagree else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("only_pos", nargs="?", default=None,
                    help="comma-separated query names (positional, legacy)")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--crosscheck", action="store_true")
    ap.add_argument("--crosscheck-sample", type=int, default=0, metavar="N")
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--clear-cache", action="store_true",
                    help="delete tools/.oracle_cache before running")
    a = ap.parse_args()
    if a.clear_cache and os.path.isdir(CACHE_DIR):
        for f in os.listdir(CACHE_DIR):
            os.unlink(os.path.join(CACHE_DIR, f))
    only = set((a.only or a.only_pos).split(",")) if (a.only or a.only_pos) else None
    sys.exit(main(a.sf_dir, a.out_dir, only, a.fast, a.crosscheck, a.jobs,
                  cache=not a.no_cache, crosscheck_sample=a.crosscheck_sample))
