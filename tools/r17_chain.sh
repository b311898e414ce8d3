#!/bin/bash
# Round-17 measurement chain (VERDICT r16 asks #4-#6), split JVMs,
# classes frozen at the round-17 post-fix tree (/tmp/graft_r17_classes):
#   A. The 9-heavy sf10 sweep, one JVM, OFF-HEAP, no periodicGC
#      mitigation (r14 chain2 leg 2, scripted since r14, never run):
#      does the off-heap regime alone remove the r11-r13 heavy-sweep
#      OOM that r13 needed spark.cleaner.periodicGC.interval=2min for?
#   B. Span-pair sf10 spill/memory A/B under off-heap (r15 ask #4):
#      control vs forced-earlier shuffle spill vs higher memory
#      fraction, interleaved so machine drift can't bias an arm.
#   C. Span strategy window-vs-bounded forcing at sf0.1 and sf1
#      (r14 FLOORS crossover, r16 ask #6): same-day A/B points to
#      retune spark.graft.span.boundedMinBytes or record a
#      measurement-only decision.
set -u
CLASSES=/tmp/graft_r17_classes
OUT=/tmp/r17_chain
OFFHEAP="spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=4g"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
mkdir -p "$OUT"

run_bench() { # tag sfdir only warmup reps extraconf
  local tag=$1 sf=$2 only=$3 wu=$4 reps=$5 extra=$6
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_BENCH_ONLY=$only \
  SPARK_GRAFT_BENCH_WARMUP=$wu SPARK_GRAFT_BENCH_REPS=$reps \
  SPARK_GRAFT_BENCH_GC=1 SPARK_GRAFT_EXTRA_CONF="$extra" \
  SPARK_GRAFT_BENCH_DETAIL="$OUT/${tag}.detail.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/${tag}.out" 2> "$OUT/${tag}.err"
  echo "${tag} exit=$? ($(date -u +%H:%M:%S))"
}

SPAN=q_dedup_spans,q_dedup_span_drop
HEAVY9=q_dedup_spans,q_dedup_span_drop,q_dedup_spans_self,q_dedup_clusters,q_dedup_clusters_incremental,q_dedup_ngram,q_leakage_split,q_curation_pipeline,q_cdc_pipeline

echo "=== leg A: 9-heavy sf10 sweep off-heap, no periodicGC ($(date -u +%H:%M:%S)) ==="
run_bench sweep9_oh /tmp/graft_sf10 "$HEAVY9" 1 2 "$OFFHEAP"

echo "=== leg B: span-pair sf10 spill/memfrac A/B ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench spill_ctrl_$i    /tmp/graft_sf10 "$SPAN" 1 2 "$OFFHEAP"
  run_bench spill_thresh_$i  /tmp/graft_sf10 "$SPAN" 1 2 "$OFFHEAP;spark.shuffle.spill.numElementsForceSpillThreshold=16777216"
  run_bench spill_memfrac_$i /tmp/graft_sf10 "$SPAN" 1 2 "$OFFHEAP;spark.memory.fraction=0.8"
done

echo "=== leg C: span window-vs-bounded at sf0.1 / sf1 ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench selw_sf01_$i /root/testdata/sf0.1 "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=999999999999"
  run_bench selb_sf01_$i /root/testdata/sf0.1 "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=1"
  run_bench selw_sf1_$i  /tmp/graft_sf1       "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=999999999999"
  run_bench selb_sf1_$i  /tmp/graft_sf1       "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=1"
done
echo "=== chain ALL DONE ($(date -u +%H:%M:%S)) ==="
