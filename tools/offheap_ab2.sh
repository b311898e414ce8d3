#!/bin/bash
# Off-heap A/B phase 2: the 4g-heap arm (offheap_ab.sh) OOM'd outright —
# window-operator row buffering is ON-heap, so halving the heap starves
# it before Tungsten pages even matter. Phase 2 keeps the full 8g heap
# and ADDS 4g off-heap for Tungsten execution memory: not budget-equal
# to the control, but it isolates the actual hypothesis (do humongous
# long[] sorter pages leaving the heap collapse the GCLocker-storm
# nondeterminism?). On a real cluster the off-heap size is budgeted
# separately (memoryOverhead) anyway.
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r13_classes}
OUT=/tmp/offheap_ab
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
for i in 1 2 3; do
  SPARK_GRAFT_EXTRA_CONF="spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=4g" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/offheap8_$i.out" 2> "$OUT/offheap8_$i.err"
  echo "offheap8_$i exit=$?"
done
echo DONE
