#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a
scale factor, then replay every oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows fully sorted).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [--manifest]

Always writes a machine-readable record of the run to tools/last_check.json
(committed per round) so an empty driver-side CORRECTNESS artifact is
detectable and falsifiable against the builder-side record (the
CORRECTNESS_r13.json == {} failure mode).

--manifest additionally asserts registry hygiene against the dump's
_MANIFEST.json: every query has an oracle (or is on the documented
rows-only allowlist), every oracle has a query, every query's result dir
was written, and every query name appears in COVERAGE.md — a drifted name
would otherwise silently drop a query from the gate.
"""
import json, math, os, subprocess, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'], cwd="/root/repo",
        capture_output=True, text=True, timeout=1800)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    # A failed sbt run must FAIL the gate, not fall through to a
    # comparison of whatever stale dump sits in OUT (r18: a compile
    # error after a partial git-checkout produced a green "203/203
    # pass" against outputs from an earlier run).
    if r.returncode != 0:
        print("\n".join((r.stdout + r.stderr).splitlines()[-15:]))
        print(f"FATAL: sbt runMain graft.Verify exited {r.returncode}"
              " - refusing to compare a stale dump")
        sys.exit(2)

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    # floats compare BIT-EXACTLY — the determinism contract (decimal sums,
    # integer dot products, fixed-order IEEE expressions) promises identical
    # doubles, and the driver may hash them raw.
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    if isinstance(v, (list, dict)):
        # The DRIVER's pandas comparator crashes on complex cells
        # ("unhashable type: numpy.ndarray", r4 ext43/ext50) — fail here
        # too instead of quietly normalizing to tuples.
        raise TypeError(
            f"complex cell — driver comparator cannot sort/hash it: {v!r}")
    return v

manifest_fails = []
if "--manifest" in sys.argv:
    man = json.load(open(f"{OUT}/_MANIFEST.json"))
    queries, oracles = set(man["queries"]), set(man["oracles"])
    written = set(man["written"])
    # Queries with no SQL-expressible oracle get the driver's weaker
    # rows-only check; list them explicitly so a silently-dropped oracle
    # is a manifest failure, not an invisible downgrade.
    ROWS_ONLY = set()
    for q in sorted(queries - oracles - ROWS_ONLY):
        manifest_fails.append(f"query without oracle: {q}")
    for q in sorted(oracles - queries):
        manifest_fails.append(f"oracle without query: {q}")
    for q in sorted(queries - written):
        manifest_fails.append(f"query result never written: {q}")
    if set(oracle) != oracles:
        manifest_fails.append(
            f"oracle_sql.json/{len(oracle)} != manifest oracles/{len(oracles)}")
    cov = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md"),
               encoding="utf-8").read()
    for q in sorted(queries):
        if q not in cov:
            manifest_fails.append(f"query not in COVERAGE.md: {q}")
    for m in manifest_fails:
        print(f"MANIFEST FAIL: {m}")
    if not manifest_fails:
        print(f"MANIFEST OK: {len(queries)} queries, {len(oracles)} oracles, "
              f"{len(written)} written, all in COVERAGE.md")

fails = []
per_query = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
        got_rel = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        got = got_rel.fetchall()
        gcols = [d[0] for d in con.description]
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: columns {sorted(gcols)} vs oracle {sorted(wcols)}")
            per_query[name] = f"fail: columns {sorted(gcols)} vs {sorted(wcols)}"
            fails.append(name); continue
        widx = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
        wrows = sorted(tuple(norm(r[i]) for i in widx) for r in want)
        grows = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
        if wrows == grows:
            # per-oracle seconds in the record: a 1000-s CTE-inlining
            # blow-up (the ext124 lesson) should be visible in
            # last_check.json, not rediscovered by bisection
            print(f"PASS {name} ({len(grows)} rows, "
                  f"{time.time() - t0:.1f}s)")
            per_query[name] = (f"pass ({len(grows)} rows, "
                               f"{time.time() - t0:.1f}s)")
        else:
            print(f"FAIL {name}: {len(grows)} spark rows vs {len(wrows)} oracle rows")
            onlyg = [r for r in grows if r not in set(wrows)][:3]
            onlyw = [r for r in wrows if r not in set(grows)][:3]
            print(f"  spark-only: {onlyg}\n  oracle-only: {onlyw}")
            fails.append(name)
            per_query[name] = f"fail: {len(grows)} vs {len(wrows)} rows"
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails.append(name)
        per_query[name] = f"error: {e}"

record = {
    "sf_dir": SF, "out_dir": OUT,
    "total": len(oracle), "passed": len(oracle) - len(fails),
    "failures": fails, "manifest_failures": manifest_fails,
    "per_query": per_query,
}
with open(os.path.join(os.path.dirname(__file__), "last_check.json"),
          "w", encoding="utf-8") as f:
    json.dump(record, f, indent=1, sort_keys=True)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass" +
      (f"; FAILURES: {fails}" if fails else ""))
sys.exit(1 if fails or manifest_fails else 0)
