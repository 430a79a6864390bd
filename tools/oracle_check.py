#!/usr/bin/env python3
"""Dev harness (not part of the Spark library): replicate the driver's
DuckDB-oracle compare loop locally.

Usage: python3 tools/oracle_check.py [sf0.01] [outDir]

Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` first if outDir is missing,
then for each query: load <outDir>/<name> parquet (Spark result), run the
matching SQL from oracle_sql.json in DuckDB over the testdata tables, and
compare row multisets column-sorted-by-name (mirroring the driver's check).
"""
import json, math, os, subprocess, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
SFDIR = f"/root/testdata/{SF}"
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/verify_{SF}"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not os.path.exists(os.path.join(OUT, "oracle_sql.json")):
    subprocess.run(["sbt", f'runMain graft.Verify {SFDIR} {OUT}'],
                   cwd="/root/repo", check=True)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(OUT, name)
    if not os.path.isdir(pdir):
        fails.append((name, "spark result missing"))
        continue
    try:
        sres = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        dres = con.execute(sql)
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema mismatch spark={sorted(scols)} duck={sorted(dcols)}"))
        continue
    # Type-sensitive check mirroring the driver's hash: DuckDB widenings the
    # Spark parquet can't produce (sum(BIGINT)->HUGEINT, DECIMAL) must fail
    # here, not in the driver artifact. Normalized as the driver provably
    # accepts (CORRECTNESS_r05): TIMESTAMP WITH TIME ZONE == TIMESTAMP, and
    # any signed int width <= 64 compares equal (q48/q49/q98/q110 are
    # INTEGER-vs-BIGINT and hash green); HUGEINT stays distinct (q106 red).
    def ntype(t):
        t = t.replace(" WITH TIME ZONE", "")
        return "INT64" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
    stypes = {r[0]: ntype(r[1]) for r in
              con.execute(f"DESCRIBE SELECT * FROM '{pdir}/*.parquet'").fetchall()}
    dtypes = {r[0]: ntype(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    tdiff = [(c, stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]]
    if tdiff:
        fails.append((name, f"type mismatch (spark vs duck): {tdiff}"))
        continue
    # The DRIVER's pandas harness cannot sort/hash complex-typed cells
    # (r13: q256's list column -> "unhashable type: 'numpy.ndarray'"), so
    # this check must fail the same inputs even though norm_cell below
    # could tuple-normalize them — that divergence is how q256 shipped red.
    complexcols = [(c, t) for c, t in stypes.items()
                   if "[]" in t or "STRUCT" in t or "MAP" in t]
    if complexcols:
        fails.append((name, f"complex-typed columns the driver harness "
                            f"cannot hash: {complexcols}"))
        continue
    a, b = norm(srows, scols), norm(drows, dcols)
    if a != b:
        diff = next(((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y),
                    ("len", len(a), len(b)))
        fails.append((name, f"rows mismatch: first diff {diff}"))
    else:
        passes.append((name, len(a)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
