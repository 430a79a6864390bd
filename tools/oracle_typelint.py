#!/usr/bin/env python3
"""Dev harness (not part of the Spark library): DESCRIBE-based oracle type lint.

The driver's correctness hash is TYPE-sensitive: a DuckDB oracle column whose
type differs from the Spark parquet output hashes differently even when every
value is identical. DuckDB silently widens in ways Spark never emits —
`sum(BIGINT)` (plain or windowed) returns HUGEINT, `sum(INTEGER)` too,
`avg`-adjacent arithmetic can produce DECIMAL — and this trap has bitten twice
(q12 round 2, q106 round 5). This lint DESCRIBEs every oracleSql entry and
fails on any column type Spark cannot produce, BEFORE the driver ever runs.

Usage: python3 tools/oracle_typelint.py [sf0.01] [oracleJsonPath]

If oracleJsonPath is omitted it dumps a fresh oracle_sql.json via
`sbt "runMain graft.Verify <sfDir> /tmp/oracle_sql_only -"` (the `-` filter
matches no query, so only the SQL dump runs — a few seconds, no queries).
"""
import json, os, re, subprocess, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
SFDIR = f"/root/testdata/{SF}"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if len(sys.argv) > 2:
    ORACLE_JSON = sys.argv[2]
else:
    out = "/tmp/oracle_sql_only"
    subprocess.run(["sbt", f'runMain graft.Verify {SFDIR} {out} -'],
                   cwd="/root/repo", check=True)
    ORACLE_JSON = os.path.join(out, "oracle_sql.json")

# Types Spark's parquet writer can emit (as DuckDB reads them back) AND the
# driver's pandas harness can hash. Anything outside this set fails:
#  - HUGEINT, DECIMAL(x,y), unsigned ints — hash-mismatch against the Spark
#    result even with identical values (q12 round 2, q106 round 5);
#  - ANY complex type (list/struct/map) — the driver's pandas sort_values
#    dies on unhashable array cells (q256 round 13: "unhashable type:
#    'numpy.ndarray'"), so a declared query may not emit one at top level.
#    Serialize to a scalar (join/digest) on BOTH sides instead.
ALLOWED = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR|DATE"
    r"|TIMESTAMP( WITH TIME ZONE)?|BLOB)$")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(ORACLE_JSON))
bad, errs = [], []
for name, sql in sorted(oracle.items()):
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        errs.append((name, str(e).splitlines()[0]))
        continue
    for cname, ctype, *_ in cols:
        if not ALLOWED.match(ctype):
            bad.append((name, cname, ctype))

for name, cname, ctype in bad:
    print(f"TYPELINT FAIL {name}: column `{cname}` is {ctype} "
          f"(not Spark-producible — add a CAST in the oracle SQL)")
for name, msg in errs:
    print(f"TYPELINT ERROR {name}: {msg}")
print(f"\n{len(oracle) - len(set(n for n, *_ in bad)) - len(errs)} clean, "
      f"{len(set(n for n, *_ in bad))} flagged, {len(errs)} errors "
      f"of {len(oracle)} oracle entries")
sys.exit(1 if (bad or errs) else 0)
