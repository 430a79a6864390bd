#!/usr/bin/env python3
"""Dev harness: cross-check GATES.json from the Verify dumps alone.

The four `no_oracle` queries are gated by engine-computed metrics
(tools/Gates.scala -> gates.json). This recomputes the SAME metrics
independently — DuckDB/python over the dumped parquet results joined
against the dumped exact arms (q23 for recall, q24 for the pair set) and
the base lineitem table (for the GK rank deviation) — so the gate values
are cross-checked numbers, not self-reported ones.

Usage: python3 tools/gate_check.py [sf0.01] [outDir]
(outDir defaults to /tmp/verify_<sf>; run graft.Verify there first.)
"""
import json
import math
import os
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
SFDIR = f"/root/testdata/{SF}"
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/verify_{SF}"

con = duckdb.connect()

def dump(name):
    return f"(SELECT * FROM '{OUT}/{name}/*.parquet')"

# -- q29/q30: mean recall@3 vs the dumped exact arm (q23) ------------------
def recall(name):
    rows = con.execute(f"""
        WITH ex AS (SELECT query_id, vec_id FROM {dump('q23_ann_topk')}),
             ap AS (SELECT query_id, vec_id FROM {dump(name)}),
             per AS (SELECT e.query_id,
                       count(a.vec_id) / 3.0 AS r
                     FROM ex e LEFT JOIN ap a
                       ON e.query_id = a.query_id AND e.vec_id = a.vec_id
                     GROUP BY e.query_id)
        SELECT avg(r) FROM per""").fetchone()
    return rows[0]

# -- q34: symmetric pair-set Jaccard vs the dumped exact pairs (q24) -------
def pair_jaccard():
    i, u = con.execute(f"""
        WITH l AS (SELECT vec_a, vec_b FROM {dump('q34_knn_pairs_lsh')}),
             e AS (SELECT vec_a, vec_b FROM {dump('q24_knn_pairs')}),
             ix AS (SELECT count(*) AS n FROM l SEMI JOIN e USING (vec_a, vec_b)),
             un AS (SELECT count(*) AS n FROM
                      (SELECT * FROM l UNION SELECT * FROM e))
        SELECT ix.n, un.n FROM ix CROSS JOIN un""").fetchone()
    return 1.0 if u == 0 else i / u

# -- q127: max empirical-rank deviation of the dumped sketch values --------
def max_rank_dev():
    # dumped columns: l_returnflag, p25/p50/p75/p90 (whatever Verify wrote)
    cols = [d[0] for d in con.execute(
        f"DESCRIBE SELECT * FROM '{OUT}/q127_percentiles_approx/*.parquet'"
    ).fetchall()]
    pcols = [c for c in cols if c != "l_returnflag"]
    def p_of(c):  # "p25" -> 0.25, "p90" -> 0.90
        return int("".join(ch for ch in c if ch.isdigit())) / 100.0
    devs = []
    for c in pcols:
        p = p_of(c)
        rows = con.execute(f"""
            WITH v AS (SELECT l_returnflag AS g,
                         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                       FROM '{SFDIR}/lineitem.parquet'),
                 a AS (SELECT l_returnflag AS g, "{c}" AS av
                       FROM '{OUT}/q127_percentiles_approx/*.parquet')
            SELECT a.g,
                   abs(sum(CASE WHEN CAST(v.v AS DOUBLE) <= a.av THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE) - {p}) AS dev
            FROM v JOIN a USING (g) GROUP BY a.g""").fetchall()
        devs += [r[1] for r in rows]
    return max(devs) if devs else 0.0

recomputed = {
    "q29_ann_lsh": ("recall_at_3", recall("q29_ann_lsh")),
    "q30_ann_ivf": ("recall_at_3", recall("q30_ann_ivf")),
    "q34_knn_pairs_lsh": ("pair_set_jaccard", pair_jaccard()),
    "q127_percentiles_approx": ("max_rank_deviation", max_rank_dev()),
}

gates = json.load(open(os.path.join(OUT, "gates.json")))
fails = []
for q, (metric, val) in recomputed.items():
    g = gates[q]
    ok = g["metric"] == metric and math.isclose(
        round(val, 4), g["value"], abs_tol=1e-4)
    print(f"{'PASS' if ok else 'FAIL'} {q}: engine {g['value']:.4f} "
          f"vs recomputed {val:.4f} ({metric})")
    if not ok:
        fails.append(q)
    # the threshold itself must also hold on the RECOMPUTED value
    holds = val >= g["threshold"] if g["op"] == ">=" else val <= g["threshold"]
    if not holds:
        print(f"FAIL {q}: recomputed {val:.4f} violates threshold "
              f"{g['op']} {g['threshold']}")
        fails.append(q)

print(f"\n{len(recomputed) - len(set(fails))} of {len(recomputed)} gates cross-checked OK")
sys.exit(1 if fails else 0)
