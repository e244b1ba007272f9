#!/usr/bin/env python3
"""Floor-gate evaluation of a recorded bench artifact.

Applies the SAME context normalization as graft.PerfLab's in-process
gate (see its scaladoc): per-query ratio to the recorded floor, divided
by the suite's median ratio (clamped >= 1) so uniform machine-load
inflation — the r8 driver bench ran the whole suite at a ~1.45x median
over builder-context floors with zero plan drift — cancels, and only
IDIOSYNCRATIC drift (one query regressing while its neighbors hold)
breaches. This makes the stated gate result reproducible from any
recorded artifact: builder bench_last.json or the driver's BENCH_r{N}
log-tail capture.

Usage:
  python3 tools/floor_check.py [bench_json ...]   # default bench_last.json

Exit 2 on any normalized breach (>2x normalized ratio, with the same
small-floor slack logic as PerfLab).
"""
import json
import re
import statistics
import sys

FLOOR_MARGIN = 2.0       # artifact gate: normalized ratio ceiling
SMALL_FLOOR_SEC = 0.5
SMALL_MARGIN = 2.5       # sub-second floors are scheduler-noise bound
SLACK_SEC = 0.35
# r9 ADVICE: unbounded median-normalization is blind to a UNIFORM real
# regression (every query 3x slower via a shared path reads as ctx~3,
# zero breaches). Two closures, mirroring graft.PerfLab: ctx is capped
# (largest honest host-load factor observed is 1.5; 2.0 leaves margin)
# and the summed time over floor-covered queries is gated against the
# summed floors — a shared factor cancels out of per-query ratios but
# not out of the total.
CTX_CAP = 2.0
TOTAL_MARGIN = 2.0


def parse_queries(path):
    """Per-query seconds from bench_last.json or a driver BENCH_r{N}
    capture (which may hold a JSON object whose 'tail' string embeds
    escaped query_times records)."""
    txt = open(path).read()
    txt = txt.replace('\\"', '"')
    qs = {}
    for m in re.finditer(r'"((?:ext|op)\w+)":([0-9.]+)', txt):
        qs[m.group(1)] = float(m.group(2))
    total = re.findall(r'"metric":"total","value":([0-9.]+)', txt)
    return qs, (float(total[-1]) if total else None)


def main():
    floors = json.load(open("tools/perf_floors.json"))
    paths = sys.argv[1:] or ["bench_last.json"]
    failed = False
    for path in paths:
        qs, total = parse_queries(path)
        ratios = {k: qs[k] / floors[k]
                  for k in qs if floors.get(k, 0) > 0}
        if not ratios:
            print(f"{path}: no overlapping queries with floors")
            continue
        # r11 verdict item 2: a benched query with no recorded floor is
        # an ungated query — twice now a new query shipped floorless and
        # the gate silently shrank its denominator. Fail loudly instead.
        floorless = sorted(k for k in qs if floors.get(k, 0) <= 0)
        if floorless:
            print(f"{path}: FLOORLESS benched queries (run "
                  f"tools/record_floors.py): {', '.join(floorless)}")
            failed = True
        raw_ctx = statistics.median(ratios.values())
        ctx = min(CTX_CAP, max(1.0, raw_ctx))
        breaches = []
        for k in sorted(ratios):
            fl = floors[k]
            margin = SMALL_MARGIN if fl < SMALL_FLOOR_SEC else FLOOR_MARGIN
            if qs[k] > fl * margin * ctx + SLACK_SEC:
                breaches.append(
                    f"  BREACH {k}: {qs[k]:.2f}s > {margin}x floor "
                    f"{fl:.2f}s x ctx {ctx:.2f} + {SLACK_SEC}s")
        total_steady = sum(qs[k] for k in ratios)
        total_floor = sum(floors[k] for k in ratios)
        if total_steady > total_floor * TOTAL_MARGIN + SLACK_SEC * len(ratios):
            breaches.append(
                f"  BREACH SUITE TOTAL: {total_steady:.2f}s > "
                f"{TOTAL_MARGIN}x summed floors {total_floor:.2f}s "
                f"(+ per-query slack) — uniform regression the "
                f"normalized gate cannot see")
        worst = max(ratios.values())
        worst_n = max((v / ctx) for v in ratios.values())
        print(f"{path}: {len(ratios)} queries vs floors, total={total}, "
              f"ctx={ctx:.2f} (raw median {raw_ctx:.2f}), "
              f"max raw ratio {worst:.2f}, "
              f"max normalized {worst_n:.2f}, {len(breaches)} breaches")
        for b in breaches:
            print(b)
        failed = failed or bool(breaches)
    sys.exit(2 if failed else 0)


if __name__ == "__main__":
    main()
