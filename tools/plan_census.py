#!/usr/bin/env python3
"""Plan-shape census over a PlanDump corpus (r17-opt tooling).

Input: the stdout of `runMain graft.PlanDump` (all queries), which prints
`===== <name> =====` headers followed by explain("formatted") blocks.
Output: one TSV row per query — exchange count, join strategies, scan
count, aggregate kinds, generate (explode) count, InMemoryTableScan count,
whether PushedFilters is non-empty anywhere — plus a ranked anomaly list
(queries whose shape suggests redundant work: repeated identical scan
legs, sort-merge joins, many exchanges).

Usage: python3 tools/plan_census.py /tmp/plans_all.txt [--tsv out.tsv]
"""
import re
import sys
from collections import Counter


def parse(path):
    blocks = {}
    name = None
    buf = []
    for line in open(path, errors="replace"):
        m = re.match(r"^===== (\S+) =====", line)
        if m:
            if name is not None:
                blocks[name] = "".join(buf)
            name = m.group(1)
            buf = []
        elif name is not None:
            buf.append(line)
    if name is not None:
        blocks[name] = "".join(buf)
    return blocks


def census(text):
    c = {}
    # count detail-section headers ("(4) Exchange") only: each node appears
    # twice in explain("formatted") output (tree line "+- Exchange (4)" plus
    # the detail header), and `\bExchange\b` can never match inside the
    # single token "ReusedExchange" (no word boundary mid-token), so the old
    # "subtract ReusedExchange" correction undercounted and could go negative
    c["exchanges"] = len(re.findall(r"\(\d+\) Exchange\b", text))
    c["reused_exchanges"] = len(re.findall(r"\(\d+\) ReusedExchange\b", text))
    c["smj"] = len(re.findall(r"SortMergeJoin", text))
    c["bhj"] = len(re.findall(r"BroadcastHashJoin", text))
    c["shj"] = len(re.findall(r"ShuffledHashJoin", text))
    c["bnlj"] = len(re.findall(r"BroadcastNestedLoopJoin", text))
    c["cartesian"] = len(re.findall(r"CartesianProduct", text))
    c["scans_parquet"] = len(re.findall(r"Scan parquet", text))
    c["scans_rdd"] = len(re.findall(r"Scan ExistingRDD", text))
    c["imts"] = len(re.findall(r"InMemoryTableScan", text))
    c["generates"] = len(re.findall(r"\bGenerate\b", text))
    # node headers are "(N) Sort" with arguments on their own "Arguments:"
    # line — the old `\bSort \[` pattern matched nothing in formatted output
    c["sorts"] = len(re.findall(r"\(\d+\) Sort\b", text))
    c["hash_aggs"] = len(re.findall(r"\bHashAggregate\b", text))
    c["obj_hash_aggs"] = len(re.findall(r"ObjectHashAggregate", text))
    c["sort_aggs"] = len(re.findall(r"\bSortAggregate\b", text))
    c["windows"] = len(re.findall(r"\bWindow\b", text))
    c["pushed"] = len(re.findall(r"PushedFilters: \[[^\]]", text))
    # distinct parquet scan (file, ReadSchema) legs — repeated identical
    # legs mean the same file is scanned more than once in one plan
    scan_ids = re.findall(
        r"Location:.*?\[([^\]]*)\][\s\S]{0,400}?ReadSchema: (\S+)", text)
    dup = Counter(scan_ids)
    c["dup_scan_legs"] = sum(v - 1 for v in dup.values() if v > 1)
    return c


def main():
    args = [a for a in sys.argv[1:]]
    tsv_out = None
    if "--tsv" in args:
        i = args.index("--tsv")
        tsv_out = args[i + 1]
        del args[i:i + 2]
    if len(args) != 1:
        sys.exit("usage: plan_census.py <plandump.txt> [--tsv out.tsv]")
    path = args[0]
    blocks = parse(path)
    rows = []
    for name, text in sorted(blocks.items()):
        c = census(text)
        rows.append((name, c))
    cols = ["exchanges", "reused_exchanges", "smj", "bhj", "shj", "bnlj",
            "cartesian", "scans_parquet", "scans_rdd", "imts", "generates",
            "sorts", "hash_aggs", "obj_hash_aggs", "sort_aggs", "windows",
            "pushed", "dup_scan_legs"]
    out = open(tsv_out, "w") if tsv_out else sys.stdout
    print("query\t" + "\t".join(cols), file=out)
    for name, c in rows:
        print(name + "\t" + "\t".join(str(c[k]) for k in cols), file=out)
    if tsv_out:
        out.close()
    print("\n-- anomalies --", file=sys.stderr)
    for name, c in rows:
        flags = []
        if c["dup_scan_legs"] > 0:
            flags.append(f"dup_scan_legs={c['dup_scan_legs']}")
        if c["smj"] > 0:
            flags.append(f"smj={c['smj']}")
        if c["cartesian"] > 0:
            flags.append(f"cartesian={c['cartesian']}")
        if c["exchanges"] >= 8:
            flags.append(f"exchanges={c['exchanges']}")
        if c["sort_aggs"] > 0:
            flags.append(f"sort_aggs={c['sort_aggs']}")
        if flags:
            print(f"{name}: {', '.join(flags)}", file=sys.stderr)


if __name__ == "__main__":
    main()
