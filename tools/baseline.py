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
     what catches a uniformly-slow run that predates side (c) in Bench).
     All leave-one-out verdicts are computed against the ORIGINAL candidate
     set and applied in one step, then iterated to a fixed point — so the
     outcome never depends on CLI argument order (ADVICE r16);
  3. per-query [cold, warm] medians over the surviving runs become the new
     bands; queries absent from every survivor can be carried from the
     previous baseline with --carry (late-round registrations measured in a
     separate clean run — provenance is recorded in the policy line);
  4. queries whose cross-run spread WITHIN the surviving clean runs exceeds
     NOISY_RATIO (and NOISY_FLOOR_SEC absolute) in either pass are recorded
     in "noisy_queries" — a persisted property of the query (ambient-load
     sensitivity measured on clean runs), so future regression verdicts can
     cite the ledger instead of re-deriving the history (VERDICT r16 Next
     #5). RunValidity excludes ledger entries from the per-query offender
     count (side b); the total bands (a)/(c) still see them.

The bench artifacts are plain JSON; load_run reads the "queries",
"suspect", and "cold_cache_warm" fields directly (ADVICE r16 — the old
regex scrape would silently ingest any future two-element numeric field).

Usage:
  python3 tools/baseline.py [--carry OLD_BASELINE] RUN.json [RUN.json ...]
  python3 tools/baseline.py --check RUN.json ...   # report, don't write
"""
import json
import statistics
import sys

TOTAL_BAND_RATIO = 1.25
TOTAL_FLOOR_SEC = 15.0
NOISY_RATIO = 1.3
NOISY_FLOOR_SEC = 0.3


def load_run(path):
    with open(path) as f:
        doc = json.load(f)
    queries = {q: (float(v[0]), float(v[1]))
               for q, v in doc.get("queries", {}).items()}
    return queries, bool(doc.get("suspect")), bool(doc.get("cold_cache_warm"))


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


def total_band_sweep(runs):
    """Leave-one-out side-(c) exclusions, order-independent: each round
    judges EVERY candidate against the medians of the other candidates of
    that round, applies all verdicts at once, and repeats until no new
    exclusion (a fixed point — two borderline runs are judged against the
    same medians regardless of CLI order)."""
    excluded = {}
    while len(runs) >= 3:
        verdicts = {}
        for path in runs:
            others = [q for p, q in runs.items() if p != path]
            totals = shared_totals(runs[path], others)
            if totals is None:
                continue
            for label, (mine, med) in zip(("cold", "warm"), totals):
                if mine > med * TOTAL_BAND_RATIO and mine - med > TOTAL_FLOOR_SEC:
                    verdicts[path] = (
                        f"{label} total {mine:.1f} s > {TOTAL_BAND_RATIO}x the "
                        f"other runs' median {med:.1f} s (+{mine - med:.1f} s) "
                        f"— the side-(c) uniform-slowdown shape")
                    break
        if not verdicts:
            break
        excluded.update(verdicts)
        runs = {p: q for p, q in runs.items() if p not in verdicts}
    return runs, excluded


def noisy_queries(runs):
    """Queries whose clean cross-run spread exceeds the noisy band in
    either pass — an ambient-sensitivity property worth persisting."""
    out = []
    every = sorted(set().union(*runs.values()))
    for q in every:
        for i in (0, 1):
            vals = [r[q][i] for r in runs.values() if q in r]
            if len(vals) >= 2:
                lo, hi = min(vals), max(vals)
                if lo > 0 and hi / lo > NOISY_RATIO and hi - lo > NOISY_FLOOR_SEC:
                    out.append(q)
                    break
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
        try:
            queries, suspect, cache_warm = load_run(path)
        except (OSError, ValueError) as e:
            # a truncated/unreadable artifact excludes ITSELF, it must not
            # kill the refresh for the healthy runs (the old regex scrape
            # degraded this way; json.load must too)
            excluded[path] = f"unreadable artifact: {e}"
            continue
        if not queries:
            excluded[path] = "no queries field"
        elif suspect:
            excluded[path] = "run stamped itself suspect"
        elif cache_warm:
            excluded[path] = ("cold pass ran against a cache warmed by a "
                              "discarded suspect attempt (cold_cache_warm)")
        else:
            runs[path] = queries
    runs, band_excluded = total_band_sweep(runs)
    excluded.update(band_excluded)
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
    noisy = noisy_queries(runs)
    carried = []
    if carry:
        try:
            old, _, _ = load_run(carry)
        except (OSError, ValueError) as e:
            sys.exit(f"--carry {carry} unreadable: {e}")
        for q, band in old.items():
            if q not in bands:
                bands[q] = band
                carried.append(q)
        # a carried band has no cross-run spread here; carry the old flag
        try:
            with open(carry) as f:
                old_noisy = json.load(f).get("noisy_queries", [])
            noisy.extend(q for q in old_noisy if q in carried)
        except (OSError, ValueError):
            pass
    sources = sorted(runs)
    policy = (
        "per-query [cold, warm] medians of the committed clean checksum-forced "
        f"runs ({', '.join(sources)}), refreshed by tools/baseline.py: sources "
        "must be suspect:false AND not cold_cache_warm AND pass the side-(c) "
        "total band leave-one-out fixed point (a uniformly-slow run like "
        "BENCH_full_r15_run4 is excluded mechanically, order-independently); "
        "noisy_queries = clean cross-run spread > "
        f"{NOISY_RATIO}x (+{NOISY_FLOOR_SEC} s) in either pass — RunValidity "
        "excludes them from the side-(b) per-query offender count; the "
        "canonical band for RunValidity interference/regression checks and "
        "the like-for-like trajectory baseline"
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
        f'"noisy_queries": {json.dumps(sorted(set(noisy)))},\n'
        '"queries": {\n' + body + "\n}\n}\n")
    print(f"{len(runs)} source runs, {len(excluded)} excluded, "
          f"{len(bands)} bands ({len(carried)} carried), "
          f"{len(set(noisy))} noisy", file=sys.stderr)
    if check_only:
        print(out)
    else:
        with open("BENCH_baseline_clean.json", "w") as f:
            f.write(out)
        print("wrote BENCH_baseline_clean.json", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv)
