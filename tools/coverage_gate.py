#!/usr/bin/env python3
"""Coverage gate: fail when the query suite silently shrinks.

Round 9's CORRECTNESS file had 66 entries instead of 68 — the two
queries that failed at analysis time simply VANISHED from the record
(the driver's compare only sees dumped outputs), so "66/66 green" read
as all-green while masking the round's only regression. This gate makes
a shrunken record a hard failure:

  1. latest vs prior CORRECTNESS: every query recorded in the prior
     round must appear in the latest (intentional renames/removals are
     declared with --allow-drop q_name);
  2. latest vs declared (optional): with a verify outDir, every key in
     oracle_sql.json must appear in the latest CORRECTNESS file, so a
     declared-but-never-recorded query can't hide either;
  3. any entry with err set, or with rows/schema/hash false, is listed
     (informational — the correctness bar itself is the driver's).

Usage:
  python3 tools/coverage_gate.py CORRECTNESS_r10.json CORRECTNESS_r09.json \
      [--verify-out /tmp/verify_r10] [--allow-drop q_old_name]

Exit 0 iff no undeclared coverage shrink.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("latest", help="latest CORRECTNESS_r{N}.json")
    ap.add_argument("prior", help="prior round's CORRECTNESS file")
    ap.add_argument("--verify-out", default=None,
                    help="verify outDir; checks oracle_sql.json coverage too")
    ap.add_argument("--allow-drop", action="append", default=[],
                    help="query name intentionally removed this round")
    args = ap.parse_args()

    latest, prior = load(args.latest), load(args.prior)
    allowed = set(args.allow_drop)
    problems = []

    dropped = sorted(set(prior) - set(latest) - allowed)
    if dropped:
        problems.append(
            f"{len(dropped)} queries recorded last round are MISSING from "
            f"{args.latest}: {', '.join(dropped)}")
    if len(latest) < len(prior) - len(allowed):
        problems.append(
            f"entry count shrank {len(prior)} -> {len(latest)} "
            f"({len(allowed)} drops declared)")

    if args.verify_out:
        declared = set(load(f"{args.verify_out}/oracle_sql.json"))
        unrecorded = sorted(declared - set(latest))
        if unrecorded:
            problems.append(
                f"{len(unrecorded)} declared queries have no CORRECTNESS "
                f"entry: {', '.join(unrecorded)}")

    # informational: red entries that DID get recorded
    red = sorted(n for n, e in latest.items()
                 if e.get("err") or not (e.get("rows_match")
                 and e.get("schema_match") and e.get("hash_match")))
    if red:
        print(f"[coverage_gate] note: {len(red)} recorded entries are red: "
              f"{', '.join(red)}")

    if problems:
        for p in problems:
            print(f"[coverage_gate] FAIL: {p}")
        sys.exit(1)
    print(f"[coverage_gate] PASS: {len(latest)} entries cover all "
          f"{len(prior)} prior-round queries"
          + (f" and all declared queries" if args.verify_out else ""))


if __name__ == "__main__":
    main()
