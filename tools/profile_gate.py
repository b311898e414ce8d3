#!/usr/bin/env python3
"""Per-symbol performance-regression gate over a JFR profile.

The reference's third test layer diffs pprof CPU/mem profiles of a
50k-record run against checked-in base profiles and fails on >5 % mem /
>50 % CPU growth per symbol (reference itests/common.bash:24-25,259-287).
This is the Spark-side analog:

  1. run `graft.Bench` restricted to the flagship queries under
     `-XX:StartFlightRecording` (injected via the build's
     SPARK_GRAFT_JAVA_OPTS hook),
  2. fold jdk.ExecutionSample stacks to a flat per-symbol CPU profile
     (each sample attributed to its LEAFMOST graft.* frame, so a
     regression localizes to the graft operator that got hotter; samples
     with no graft frame bucket under their leaf package, which tracks
     time that moved INTO Spark machinery, e.g. a new sort),
  3. same fold over jdk.ObjectAllocationSample weighted by bytes,
  4. diff against the checked-in base (tools/profile_base.json):
       CPU : fail if a symbol's share of total samples grew by more than
             --cpu-grow x (default 1.5, the reference's +50 %) AND by at
             least --min-delta percentage points (sampling noise floor),
       MEM : fail if a symbol's share of sampled bytes grew by more than
             --mem-grow x (default 1.25 — tighter than CPU, looser than
             the reference's +5 % absolute because allocation sampling
             is throttled and noisier than pprof's exact accounting)
             AND by at least --min-delta points.
     Symbols below --min-share in BOTH runs are ignored (noise).

Usage:
  python3 tools/profile_gate.py record   # run bench+JFR, write current.json
  python3 tools/profile_gate.py gate     # record, then diff vs the base
  python3 tools/profile_gate.py rebase   # record, then overwrite the base

Per-base conventions (r17): the default flagship base gates at method
level. The single-query cdc sf1 base MUST be gated with
PROFILE_GATE_CLASS_LEVEL=1 PROFILE_GATE_REPS=8 (plus its
PROFILE_GATE_BASE/QUERIES/SPARK_GRAFT_SF_DIR) — its short profile
flips leaf attribution between a method and its local defs run-to-run
(parseImpl/captureValue$1 traded ~9 share points on an unchanged tree
while the class total moved 0.4 points), so method-level diffs on it
gate on JIT noise, not code.

The base must be re-recorded (rebase) whenever a deliberate perf change
lands — same contract as the reference's checked-in pprof bases.
"""
import json
import os
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# PROFILE_GATE_BASE/_CURRENT: alternate profile paths, so per-query or
# per-SF bases (e.g. a q_cdc_pipeline sf1 base) can coexist with the
# default flagship base.
BASE = os.environ.get(
    "PROFILE_GATE_BASE", os.path.join(REPO, "tools", "profile_base.json"))
CURRENT = os.environ.get(
    "PROFILE_GATE_CURRENT", os.path.join(REPO, "tools", "profile_current.json"))
JFR_PATH = "/tmp/graft_profile.jfr"
# The flagship CDC path, the span family, and the composed curation
# pipeline (the hottest code paths; curation also runtime-guards the
# round-12 PushdownBarrier fix — a re-opened inlining hole would show
# RepetitionProfile's CPU share exploding). Keep this list short — the
# gate wants a comparable, quick run.
QUERIES = "q_cdc_pipeline,q_dedup_spans,q_dedup_span_drop,q_curation_pipeline"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CPU_GROW = float(os.environ.get("PROFILE_GATE_CPU_GROW", "1.5"))
MEM_GROW = float(os.environ.get("PROFILE_GATE_MEM_GROW", "1.25"))
MIN_SHARE = float(os.environ.get("PROFILE_GATE_MIN_SHARE", "0.01"))
MIN_DELTA = float(os.environ.get("PROFILE_GATE_MIN_DELTA", "0.02"))
# Retained-state leg (the one-JVM accumulation failure mode,
# SCALE_sf10_r12.json): absolute ceilings on post-GC growth across the
# gate run — heap MB retained between the first and last probe, and
# block-manager blocks still tracked at the end. These are ceilings,
# not diffs vs base: a leak shows up as monotone growth regardless of
# what the base leaked.
HEAP_RETAIN_MB = float(os.environ.get("PROFILE_GATE_HEAP_RETAIN_MB", "1024"))
BLOCK_RETAIN = int(os.environ.get("PROFILE_GATE_BLOCK_RETAIN", "200"))
RDD_RETAIN = int(os.environ.get("PROFILE_GATE_RDD_RETAIN", "8"))


def record():
    if os.path.exists(JFR_PATH):
        os.remove(JFR_PATH)
    # the EFFECTIVE query list — what the bench actually runs and what
    # the profile must be stamped with (a PROFILE_GATE_QUERIES override
    # recorded as the default list would make gate()'s diff spurious)
    queries = os.environ.get("PROFILE_GATE_QUERIES", QUERIES)
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": SF_DIR,
        "SPARK_GRAFT_BENCH_ONLY": queries,
        "SPARK_GRAFT_BENCH_REPS": os.environ.get("PROFILE_GATE_REPS", "3"),
        "SPARK_GRAFT_BENCH_WARMUP": os.environ.get("PROFILE_GATE_WARMUP", "1"),
        # per-query post-GC retention probe -> [bench-heap] stderr line
        "SPARK_GRAFT_BENCH_HEAP": "1",
        # profile settings enable ObjectAllocationSample (throttled)
        "SPARK_GRAFT_JAVA_OPTS":
            f"-XX:StartFlightRecording=settings=profile,filename={JFR_PATH},dumponexit=true",
    })
    print(f"[profile_gate] running Bench({queries}) at {SF_DIR} under JFR ...")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(JFR_PATH):
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(f"[profile_gate] bench run failed (rc={r.returncode})")
    heap_series = []
    for line in r.stderr.splitlines():
        if line.startswith("[bench-heap] "):
            heap_series = json.loads(line[len("[bench-heap] "):])["series"]
    prof = {
        "queries": queries,
        "sf_dir": SF_DIR,
        "cpu": fold("jdk.ExecutionSample"),
        "mem": fold("jdk.ObjectAllocationSample", weight_field="weight"),
        "heap_series": heap_series,
    }
    with open(CURRENT, "w") as f:
        json.dump(prof, f, indent=1, sort_keys=True)
    print(f"[profile_gate] wrote {CURRENT}")
    return prof


def fold(event, weight_field=None):
    """Flat per-symbol profile: symbol -> share of total weight."""
    r = subprocess.run(
        ["jfr", "print", "--json", "--events", event, JFR_PATH],
        capture_output=True, text=True)
    if r.returncode != 0:
        sys.exit(f"[profile_gate] jfr print failed: {r.stderr[-2000:]}")
    events = json.loads(r.stdout)["recording"].get("events", [])
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        v = e.get("values", {})
        st = v.get("stackTrace")
        frames = (st or {}).get("frames", [])
        w = float(v.get(weight_field, 1.0)) if weight_field else 1.0
        agg[attribute(frames)] += w
        total += w
    if total == 0:
        return {}
    return {s: round(w / total, 5) for s, w in agg.items()
            if w / total >= 0.001}


def attribute(frames):
    """Leafmost graft.* frame, else the leaf frame's package bucket."""
    for f in frames:
        m = f.get("method") or {}
        t = (((m.get("type") or {}).get("name")) or "").replace("/", ".")
        if t.startswith("graft."):
            return f"{t}.{m.get('name', '?')}"
    if frames:
        m = frames[0].get("method") or {}
        t = (((m.get("type") or {}).get("name")) or "?").replace("/", ".")
        return "pkg:" + ".".join(t.split(".")[:6])
    return "pkg:unknown"


def class_fold(profile):
    """Re-aggregate a per-method profile to per-CLASS granularity
    (pkg: buckets pass through). Short single-query probes flip leaf
    attribution between a method and its local defs/lambdas run-to-run
    (JIT decides which frame samples land in — r17 measured
    TestDecodingParser parseImpl/captureValue$1 trading ~9 share
    points on an UNCHANGED tree while their class total moved 0.4
    points), so gates on such bases compare class shares instead.
    """
    agg = defaultdict(float)
    for sym, share in profile.items():
        if sym.startswith("pkg:"):
            agg[sym] += share
        else:
            agg[sym.rsplit(".", 1)[0]] += share
    return {s: round(v, 5) for s, v in agg.items()}


def gate(prof):
    if not os.path.exists(BASE):
        sys.exit(f"[profile_gate] no base at {BASE}; run `rebase` first")
    base = json.load(open(BASE))
    # a per-symbol SHARE diff is only meaningful over the same workload:
    # fail fast on a base recorded over a different query set or corpus
    # rather than emit spurious pass/fail
    for key in ("queries", "sf_dir"):
        if base.get(key) != prof.get(key):
            sys.exit(f"[profile_gate] base/current {key} mismatch: "
                     f"base={base.get(key)!r} current={prof.get(key)!r} — "
                     "rebase (or set PROFILE_GATE_QUERIES/SPARK_GRAFT_SF_DIR "
                     "to match the base) before gating")
    class_level = os.environ.get("PROFILE_GATE_CLASS_LEVEL") == "1"
    failures = []
    for kind, grow in (("cpu", CPU_GROW), ("mem", MEM_GROW)):
        b, c = base.get(kind, {}), prof.get(kind, {})
        if class_level:
            b, c = class_fold(b), class_fold(c)
        for sym in sorted(set(b) | set(c)):
            bs, cs = b.get(sym, 0.0), c.get(sym, 0.0)
            # graft symbols get the tight per-symbol thresholds (the
            # reference's pprof gate covers its OWN binary's symbols);
            # pkg: buckets track time/bytes moving INTO engine
            # machinery — real signal for e.g. a new sort, but noisier
            # run-to-run (JIT, shuffle compression buffers), so they
            # gate at 2x growth and a 5-point floor.
            pkg = sym.startswith("pkg:")
            g = max(grow, 2.0) if pkg else grow
            d = max(MIN_DELTA, 0.05) if pkg else MIN_DELTA
            if max(bs, cs) < MIN_SHARE:
                continue
            if bs > 0 and cs > bs * g and cs - bs >= d:
                failures.append(
                    f"{kind.upper()} {sym}: share {bs:.3f} -> {cs:.3f} "
                    f"({cs / bs:.2f}x > {g}x)")
            elif bs == 0 and cs >= max(MIN_SHARE, d):
                failures.append(
                    f"{kind.upper()} {sym}: NEW hot symbol at share {cs:.3f}")
    # retained-state leg: a leak is monotone post-GC growth across the
    # run, gated on absolute ceilings (independent of the base)
    series = prof.get("heap_series") or []
    if len(series) >= 2:
        first, last = series[0], series[-1]
        grew = last["heap_mb"] - first["heap_mb"]
        if grew > HEAP_RETAIN_MB:
            failures.append(
                f"HEAP retained growth {first['heap_mb']} -> {last['heap_mb']} MB "
                f"(+{grew} > {HEAP_RETAIN_MB:.0f} MB ceiling)")
        if last["blocks"] - first["blocks"] > BLOCK_RETAIN:
            failures.append(
                f"BLOCKS still tracked grew {first['blocks']} -> {last['blocks']} "
                f"(> +{BLOCK_RETAIN} ceiling) — unpersisted caches or "
                "undrained broadcast/shuffle cleanup")
        # Ops that RETURN cached frames (curate's packedTrain/split, the
        # incremental cluster store) legitimately leave caller-owned
        # entries per execution — ~1 RDD / +32 blocks each, measured
        # round 13. Gate on growth across the run, not on zero.
        if last["rdds"] - first["rdds"] > RDD_RETAIN:
            failures.append(
                f"RDDS persistent-RDD count grew {first['rdds']} -> "
                f"{last['rdds']} (> +{RDD_RETAIN} ceiling) — an op caches "
                "without a release path (caller-owned result caches are "
                "bounded per execution; this is not)")
    if failures:
        print("[profile_gate] FAIL — per-symbol regressions vs base:")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    print("[profile_gate] PASS — no per-symbol CPU/mem regression vs base, "
          "no retained-state growth")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "gate"
    if mode == "record":
        record()
    elif mode == "rebase":
        prof = record()
        os.replace(CURRENT, BASE)
        print(f"[profile_gate] base rewritten at {BASE}")
    elif mode == "gate":
        gate(record())
    else:
        sys.exit(f"unknown mode {mode}")
