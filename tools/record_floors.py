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
import os
import subprocess
import sys

FORCE = "--force" in sys.argv
args = [a for a in sys.argv[1:] if a != "--force"]
RUNS = int(args[0]) if len(args) > 0 else 2
SF = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
if RUNS < 1:
    raise SystemExit("runs must be >= 1 (an empty run would truncate "
                     "perf_floors.json)")


def busy_processes():
    """Other CPU-hungry graft-adjacent processes (sbt/java/duckdb/python
    bench runs) that would contend with the floor run. Floors recorded
    under load make the gate permanently loose (r10 ctx-creep: idle ctx
    1.08 vs loaded 1.19-1.20 — r12 drift analysis), so the protocol is
    a GATE RULE here, not a comment: refuse unless --force."""
    me = os.getpid()
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid,pcpu,comm"], capture_output=True,
        text=True).stdout.splitlines()[1:]
    mine = {me}
    # collect our own descendant tree so the sbt we spawn doesn't trip it
    ppid = {}
    for ln in out:
        f = ln.split()
        if len(f) >= 4:
            ppid[int(f[0])] = int(f[1])
    def is_mine(pid):
        seen = set()
        while pid in ppid and pid not in seen:
            if pid in mine:
                return True
            seen.add(pid)
            pid = ppid[pid]
        return pid in mine
    busy = []
    for ln in out:
        f = ln.split()
        if len(f) < 4:
            continue
        pid, cpu, comm = int(f[0]), float(f[2]), f[3]
        if is_mine(pid):
            continue
        if comm in ("java", "sbt", "duckdb") and cpu > 20.0:
            busy.append(f"{comm}[{pid}] {cpu:.0f}%cpu")
        if comm.startswith("python") and cpu > 50.0:
            busy.append(f"{comm}[{pid}] {cpu:.0f}%cpu")
    return busy


contenders = busy_processes()
if contenders:
    msg = ("host is NOT idle — floors recorded now would be loose: "
           + ", ".join(contenders))
    if FORCE:
        print(f"WARNING: {msg} (proceeding under --force)")
    else:
        raise SystemExit(f"REFUSING: {msg}\n"
                         "Re-run when idle, or pass --force to override.")

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
    rec = json.load(open("/root/repo/bench_last.json"))
    qs = rec["queries"]
    # A failed query still takes wall time, so its dt is a plausible
    # number — the old `v < 0` guard never fired (ext115's sf0.1 ANSI
    # overflow recorded a fail-fast 0.36 s floor for a round). The
    # bench now reports failures explicitly; refuse on any.
    if rec.get("failed"):
        raise SystemExit(
            f"run {n}: bench reported FAILED queries — not recording: "
            + ", ".join(rec["failed"]))
    for k, v in qs.items():
        if v < 0:
            raise SystemExit(f"run {n}: {k} FAILED (-1) — not recording")
        mins[k] = min(mins.get(k, v), v)
    print(f"run {n + 1}/{RUNS}: {len(qs)} queries")

with open("tools/perf_floors.json", "w") as f:
    json.dump(dict(sorted(mins.items())), f, indent=2)
    f.write("\n")
print(f"recorded {len(mins)} floors")
