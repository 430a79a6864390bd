#!/usr/bin/env python3
"""Fold the per-leg BENCH_DETAIL files of a replay.sh run into REPLAY.json.

Usage: pair_ratios.py <outDir> <refA> <refB>

Reads every leg<N>_<A|B>.json in <outDir> and reports, per tree:
per-leg totals, the median total, and the paired verdict
median(B legs) / median(A legs) — plus per-query medians and the queries
with the largest B/A ratios in either direction (computed over the
intersection of query names, so added/removed queries don't skew the
total: the common-subset totals are reported separately from the full
totals).
"""
import json
import os
import re
import statistics
import sys

out = sys.argv[1]
ref_a, ref_b = sys.argv[2], sys.argv[3]

legs = []
for f in sorted(os.listdir(out)):
    m = re.match(r"leg(\d+)_([AB])\.json$", f)
    if not m:
        continue
    d = json.load(open(os.path.join(out, f)))
    legs.append((int(m.group(1)), m.group(2), d["query_secs"],
                 d.get("loadavg_start"), d.get("loadavg_end")))
legs.sort()
if not legs:
    sys.exit(f"no leg*_[AB].json files in {out}")

a_legs = [q for _, t, q, _, _ in legs if t == "A"]
b_legs = [q for _, t, q, _, _ in legs if t == "B"]
# a partial/aborted run must die with a diagnostic, not an uncaught
# StatisticsError (empty median) or ZeroDivisionError (empty common set)
if not a_legs or not b_legs:
    sys.exit(f"need >=1 leg per tree; got {len(a_legs)} A / {len(b_legs)} B "
             f"leg files in {out} — aborted run?")
common = sorted(set.intersection(*(set(q) for q in a_legs + b_legs)))
if not common:
    sys.exit("no query names common to every leg — "
             "legs measured disjoint query sets?")

def med_total(qmaps, names):
    return statistics.median(sum(q[n] for n in names) for q in qmaps)

per_query = {}
for n in common:
    ma = statistics.median(q[n] for q in a_legs)
    mb = statistics.median(q[n] for q in b_legs)
    per_query[n] = {"a": round(ma, 3), "b": round(mb, 3),
                    "ratio": round(mb / ma, 3) if ma > 0 else None}

tot_a = med_total(a_legs, common)
tot_b = med_total(b_legs, common)
moved = sorted((v["ratio"], n) for n, v in per_query.items()
               if v["ratio"] is not None and max(v["a"], v["b"]) >= 0.3)
report = {
    "ref_a": ref_a,
    "ref_b": ref_b,
    "legs": [{"leg": i, "tree": t,
              "total_common": round(sum(q[n] for n in common), 2),
              "total_all": round(sum(q.values()), 2),
              "loadavg": [la, le]}
             for i, t, q, la, le in legs],
    "n_common_queries": len(common),
    "median_total_a": round(tot_a, 2),
    "median_total_b": round(tot_b, 2),
    "paired_ratio_b_over_a": round(tot_b / tot_a, 4),
    "biggest_regressions": [{"q": n, **per_query[n]} for _, n in moved[::-1][:8]],
    "biggest_improvements": [{"q": n, **per_query[n]} for _, n in moved[:8]],
    "per_query": per_query,
}
path = os.path.join(out, "REPLAY.json")
tmp = path + ".tmp"
with open(tmp, "w") as f:
    json.dump(report, f, indent=1)
os.replace(tmp, path)
print(json.dumps({k: report[k] for k in
                  ("ref_a", "ref_b", "n_common_queries", "median_total_a",
                   "median_total_b", "paired_ratio_b_over_a")}))
