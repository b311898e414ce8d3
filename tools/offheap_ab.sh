#!/bin/bash
# Round-14 off-heap Tungsten A/B (VERDICT r13 item 1).
# Hypothesis (OOM_DIAG_r13.json): the 47% sf10 control spread is heap-based
# execution memory — humongous long[] sorter pages fighting GCLocker JNI
# critical sections. Moving Tungsten pages off-heap
# (spark.memory.offHeap.enabled=true, size=4g, heap lowered 8g->4g so the
# total memory budget is UNCHANGED) removes the humongous-allocation storm
# at its source. Arms:
#   offheap_{1,2,3}: 4g heap + 4g off-heap
#   control_{1,2}:   8g heap (fresh same-day controls; r13 band 275.8-404.9 s)
# Harness identical to SCALE_span_r13.json: BENCH_ONLY span pair, one JVM
# per run, warmup=1 + 2 reps, GC between reps, /tmp/graft_sf10.
# Runs plain `java` against a FROZEN copy of the r13-compiled classes
# (/tmp/graft_r13_classes) so concurrent sbt dev work cannot contaminate
# the measured code, and no sbt lock is held.
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r13_classes}
OUT=${GRAFT_AB_OUT:-/tmp/offheap_ab}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf10
export SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop
export SPARK_GRAFT_BENCH_WARMUP=1
export SPARK_GRAFT_BENCH_REPS=2
export SPARK_GRAFT_BENCH_GC=1
mkdir -p "$OUT"
run_bench() { # $1 = heap, $2 = extra-conf string, $3 = tag
  SPARK_GRAFT_EXTRA_CONF="$2" \
  java $ADD_OPENS -Xmx"$1" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/$3.out" 2> "$OUT/$3.err"
  echo "$3 exit=$?"
}
for i in 1 2 3; do
  run_bench 4g "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=4g" "offheap_$i"
done
for i in 1 2; do
  run_bench 8g "" "control_$i"
done
echo DONE
