#!/usr/bin/env python3
"""Summarize a directory of graft.Bench A/B runs into one JSON blob.

Each run is a pair <tag>.out / <tag>.err produced by one Bench JVM:
  - .out ends with the bench JSON line {"metric":"total",...}
  - .err contains a [bench-samples] {...} line with per-rep samples
Emits {tag: {total_s, queries: {...}, reps: {...}, failed_reps?, exit_ok}}
plus per-arm aggregate spread stats when tags share a prefix_N naming.

Usage: ab_summarize.py DIR [DIR...]
"""
import json
import re
import sys
from pathlib import Path


def trimmed_mean(xs):
    s = sorted(xs)
    if len(s) >= 3:
        s = s[1:-1]
    return round(sum(s) / len(s), 3) if s else None


def parse_run(out_path: Path):
    err_path = out_path.with_suffix(".err")
    run = {}
    for line in out_path.read_text().splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            j = json.loads(line)
            run["total_s"] = j.get("value")
            run["queries"] = j.get("queries", {})
            if "cal_sec" in j:
                run["cal_sec"] = j["cal_sec"]
            if "failed_reps" in j:
                run["failed_reps"] = j["failed_reps"]
    gclocker = len(re.findall(r"GCLocker too often", out_path.read_text(errors="replace")))
    if err_path.exists():
        text = err_path.read_text(errors="replace")
        for line in text.splitlines():
            if line.startswith("[bench-samples]"):
                j = json.loads(line[len("[bench-samples]"):])
                run["reps"] = j.get("samples", {})
        gclocker += len(re.findall(r"GCLocker too often", text))
    run["gclocker_warnings"] = gclocker
    # round-15 compact stdout line carries no per-query map; rebuild the
    # trimmed means from the (unwindowed) stderr samples
    if not run.get("queries") and run.get("reps"):
        # a query whose reps all failed has an empty sample list — keep
        # the old stdout map's -1.0 sentinel rather than surfacing None
        run["queries"] = {q: (trimmed_mean(v) if v else -1.0)
                          for q, v in run["reps"].items()}
    return run if run else None


def spread(vals):
    vals = [v for v in vals if v is not None and v > 0]
    if len(vals) < 2:
        return None
    lo, hi = min(vals), max(vals)
    return {"min": lo, "max": hi, "spread_pct": round(100.0 * (hi - lo) / lo, 1),
            "n": len(vals)}


def main(dirs):
    out = {}
    for d in dirs:
        d = Path(d)
        runs = {}
        for out_path in sorted(d.glob("*.out")):
            parsed = parse_run(out_path)
            if parsed:
                runs[out_path.stem] = parsed
        # Group tags like control_1/control_2 into arms.
        arms = {}
        for tag, run in runs.items():
            m = re.match(r"(.+)_(\d+)$", tag)
            arm = m.group(1) if m else tag
            arms.setdefault(arm, []).append(run)
        arm_stats = {}
        for arm, rs in arms.items():
            ok = [r for r in rs if "failed_reps" not in r]
            totals = [r.get("total_s") for r in ok]
            per_q = {}
            all_reps = {}
            for r in ok:
                for q, reps in r.get("reps", {}).items():
                    all_reps.setdefault(q, []).extend(reps)
                for q, v in r.get("queries", {}).items():
                    per_q.setdefault(q, []).append(v)
            arm_stats[arm] = {
                "n_runs_clean": len(ok),
                "n_runs_total": len(rs),
                "total_spread": spread(totals),
                "per_query_run_spread": {q: spread(v) for q, v in per_q.items()},
                "per_rep_spread": {q: spread(v) for q, v in all_reps.items()},
            }
        out[str(d)] = {"runs": runs, "arms": arm_stats}
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/offheap_ab"])
