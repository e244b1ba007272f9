#!/usr/bin/env python3
"""Re-record tools/perf_floors.json from fresh graft.Bench runs.

Floors are per-query BENCH-semantics steady states (each Bench run is
already the elementwise min of two full passes); this takes the
elementwise min across N runs so a single noisy run never inflates a
floor. Run with the machine otherwise idle — floors recorded under load
make the gate permanently loose (the r10 ctx-creep lesson).

Usage: python3 tools/record_floors.py [runs=2] [sfdir=/root/testdata/sf0.1]
"""
import json
import subprocess
import sys

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

mins = {}
for n in range(RUNS):
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], cwd="/root/repo",
        capture_output=True, text=True, timeout=3600,
        env={**__import__("os").environ, "SPARK_GRAFT_SF_DIR": SF,
             "SPARK_GRAFT_CPUS": "32"})
    # stdout splits the per-query map into <=10-entry parts (driver log
    # tail limits); the complete record is the bench_last.json artifact
    if r.returncode != 0:
        raise SystemExit(f"run {n}: sbt exited {r.returncode}\n"
                         + r.stdout[-2000:] + r.stderr[-2000:])
    qs = json.load(open("/root/repo/bench_last.json"))["queries"]
    for k, v in qs.items():
        if v < 0:
            raise SystemExit(f"run {n}: {k} FAILED (-1) — not recording")
        mins[k] = min(mins.get(k, v), v)
    print(f"run {n + 1}/{RUNS}: {len(qs)} queries")

with open("tools/perf_floors.json", "w") as f:
    json.dump(dict(sorted(mins.items())), f, indent=2)
    f.write("\n")
print(f"recorded {len(mins)} floors")
