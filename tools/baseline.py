#!/usr/bin/env python3
"""Mechanical refresh of BENCH_baseline_clean.json (VERDICT r15 Next #1).

The r15 failure: run4 — a UNIFORM ~1.3x ambient slowdown that passed the
pre-(c) two-sided validity policy — was eligible for the hand refresh and
skewed cross-round medians. This tool makes the refresh rule-driven so a
run4-shaped artifact can never enter the baseline again:

  1. every source run's own "suspect" stamp must be false (a run that
     flagged itself is refused outright);
  2. the side-(c) TOTAL band is re-applied here, leave-one-out: a run whose
     cold or warm total over shared queries exceeds 1.25x the median of the
     OTHER candidates' totals by > 15 s is excluded and reported (this is
     what catches a uniformly-slow run that predates side (c) in Bench);
  3. per-query [cold, warm] medians over the surviving runs become the new
     bands; queries absent from every survivor can be carried from the
     previous baseline with --carry (late-round registrations measured in a
     separate clean run — provenance is recorded in the policy line).

Usage:
  python3 tools/baseline.py [--carry OLD_BASELINE] RUN.json [RUN.json ...]
  python3 tools/baseline.py --check RUN.json ...   # report, don't write
"""
import json
import re
import statistics
import sys

TOTAL_BAND_RATIO = 1.25
TOTAL_FLOOR_SEC = 15.0
QUERY_RE = re.compile(
    r'"([A-Za-z0-9_]+)"\s*:\s*\[\s*(-?[0-9.]+)\s*,\s*(-?[0-9.]+)\s*\]')


def load_run(path):
    text = open(path).read()
    queries = {m.group(1): (float(m.group(2)), float(m.group(3)))
               for m in QUERY_RE.finditer(text)}
    suspect = bool(re.search(r'"suspect"\s*:\s*true', text))
    cache_warm = bool(re.search(r'"cold_cache_warm"\s*:\s*true', text))
    return queries, suspect, cache_warm


def shared_totals(run, others):
    """(run_total, median_other_total) per pass over the queries every
    frame shares — apples to apples even when batteries differ."""
    shared = set(run)
    for o in others:
        shared &= set(o)
    if not shared:
        return None
    out = []
    for i in (0, 1):
        mine = sum(run[q][i] for q in shared)
        med = statistics.median(sum(o[q][i] for q in shared) for o in others)
        out.append((mine, med))
    return out


def main(argv):
    args = argv[1:]
    check_only = "--check" in args
    args = [a for a in args if a != "--check"]
    carry = None
    if "--carry" in args:
        i = args.index("--carry")
        carry = args[i + 1]
        del args[i:i + 2]
    if not args:
        sys.exit(__doc__)
    runs, excluded = {}, {}
    for path in args:
        queries, suspect, cache_warm = load_run(path)
        if not queries:
            excluded[path] = "no parseable queries block"
        elif suspect:
            excluded[path] = "run stamped itself suspect"
        elif cache_warm:
            excluded[path] = ("cold pass ran against a cache warmed by a "
                              "discarded suspect attempt (cold_cache_warm)")
        else:
            runs[path] = queries
    # leave-one-out total band: one sweep, excluding against the medians of
    # the other still-candidate runs (>= 2 others needed for a median that
    # the candidate itself cannot drag)
    if len(runs) >= 3:
        for path in list(runs):
            others = [q for p, q in runs.items() if p != path]
            totals = shared_totals(runs[path], others)
            if totals is None:
                continue
            for label, (mine, med) in zip(("cold", "warm"), totals):
                if mine > med * TOTAL_BAND_RATIO and mine - med > TOTAL_FLOOR_SEC:
                    excluded[path] = (
                        f"{label} total {mine:.1f} s > {TOTAL_BAND_RATIO}x the "
                        f"other runs' median {med:.1f} s (+{mine - med:.1f} s) "
                        f"— the side-(c) uniform-slowdown shape")
                    del runs[path]
                    break
    for path, why in excluded.items():
        print(f"EXCLUDED {path}: {why}", file=sys.stderr)
    if len(runs) < 2:
        sys.exit("refusing to write a baseline from fewer than 2 clean runs")
    all_queries = sorted(set().union(*runs.values()))
    bands = {}
    for q in all_queries:
        colds = [r[q][0] for r in runs.values() if q in r]
        warms = [r[q][1] for r in runs.values() if q in r]
        bands[q] = (statistics.median(colds), statistics.median(warms))
    carried = []
    if carry:
        old, _, _ = load_run(carry)
        for q, band in old.items():
            if q not in bands:
                bands[q] = band
                carried.append(q)
    sources = sorted(runs)
    policy = (
        "per-query [cold, warm] medians of the committed clean checksum-forced "
        f"runs ({', '.join(sources)}), refreshed by tools/baseline.py: sources "
        "must be suspect:false AND not cold_cache_warm AND pass the side-(c) "
        "total band leave-one-out (a uniformly-slow run like BENCH_full_r15_run4 "
        "is excluded mechanically); the canonical band for RunValidity "
        "interference/regression checks and the like-for-like trajectory baseline"
        + (f"; bands for [{', '.join(sorted(carried))}] carried from {carry} "
           "(registered after the source runs)" if carried else ""))
    body = ",\n".join(
        f'  "{q}": [{bands[q][0]:.3f}, {bands[q][1]:.3f}]' for q in sorted(bands))
    out = (
        "{\n"
        f'"policy": {json.dumps(policy)},\n'
        f'"source_runs": {json.dumps(sources)},\n'
        f'"excluded_runs": {json.dumps({p: w for p, w in excluded.items()})},\n'
        f'"n_queries": {len(bands)},\n'
        '"queries": {\n' + body + "\n}\n}\n")
    print(f"{len(runs)} source runs, {len(excluded)} excluded, "
          f"{len(bands)} bands ({len(carried)} carried)", file=sys.stderr)
    if check_only:
        print(out)
    else:
        with open("BENCH_baseline_clean.json", "w") as f:
            f.write(out)
        print("wrote BENCH_baseline_clean.json", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv)
