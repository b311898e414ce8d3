#!/usr/bin/env python3
"""Per-decade scale report over heavy-tail bench JSONs.

Input: 2+ Bench JSON lines (same SPARK_GRAFT_BENCH_ONLY set, same reps)
measured at successive 10x data scales. Output: a markdown table of
per-query times and per-DECADE ratios, with the round criterion
(<=15x per decade, the same bar BENCH_sf1 used) applied to each step,
so superlinearity shows up where it happens instead of being averaged
away across two decades.

Usage:
  python3 tools/scale_report.py sf0.1:/tmp/heavy_sf0.1.json \
      sf1:/tmp/heavy_sf1.json sf10:/tmp/heavy_sf10.json
"""
import json
import sys

CRIT = 15.0


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    tags, data = [], []
    for spec in argv[1:]:
        tag, path = spec.split(":", 1)
        tags.append(tag)
        data.append(load(path)["queries"])
    queries = sorted(data[0])
    header = ["query"] + [f"{t} (s)" for t in tags]
    for a, b in zip(tags, tags[1:]):
        header.append(f"{b}/{a}")
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    worst = (None, 0.0)
    failures = []
    for q in queries:
        times = [d.get(q) for d in data]
        row = [q] + [f"{t:.2f}" if t is not None else "—" for t in times]
        for i in range(len(times) - 1):
            a, b = times[i], times[i + 1]
            if a and b and a > 0:
                r = b / a
                row.append(f"{r:.2f}×")
                if r > worst[1]:
                    worst = (f"{q} {tags[i]}→{tags[i+1]}", r)
                if r > CRIT:
                    failures.append((q, tags[i], tags[i + 1], r))
            else:
                row.append("—")
        print("| " + " | ".join(row) + " |")
    totals = [sum(v for v in d.values() if v) for d in data]
    trow = ["**total**"] + [f"{t:.2f}" for t in totals]
    for i in range(len(totals) - 1):
        trow.append(f"{totals[i+1]/totals[i]:.2f}×")
    print("| " + " | ".join(trow) + " |")
    print()
    print(f"Criterion: <={CRIT:.0f}x per decade. Worst step: {worst[0]} at "
          f"{worst[1]:.2f}x.")
    if failures:
        print("FAILURES:")
        for q, a, b, r in failures:
            print(f"  {q} {a}->{b}: {r:.2f}x")
        return 1
    print("FAILURES: 0")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
