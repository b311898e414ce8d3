#!/bin/bash
# Round-14 measurement chain 2 (after the off-heap adjudication):
#   1. Count-prefilter A/B at sf10 UNDER THE OFF-HEAP REGIME
#      (OFFHEAP_AB_sf10_r14.json: 1.4% run-level resolution) — 2 runs
#      per arm, interleaved base/pref so slow machine drift can't bias
#      an arm. boundedMinBytes forcing is unnecessary at sf10 (auto
#      already picks bounded), but kept for config parity with the sf1
#      phase.
#   2. The 9-heavy sf10 sweep, one JVM, OFF-HEAP, no periodicGC
#      mitigation: does the off-heap regime alone also remove the
#      r11-r13 heavy-sweep OOM? (r13 needed periodicGC=2min.)
set -u
OFFHEAP="spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=4g"

echo "=== chain2: prefilter sf10 A/B off-heap ($(date -u +%H:%M:%S)) ==="
GRAFT_AB_SF=/tmp/graft_sf10 GRAFT_AB_TAG=sf10oh GRAFT_AB_RUNS=2 \
GRAFT_AB_REPS=2 GRAFT_AB_EXTRA="$OFFHEAP" \
bash /root/repo/tools/prefilter_ab.sh

echo "=== chain2: 9-heavy sf10 sweep off-heap, no periodicGC ($(date -u +%H:%M:%S)) ==="
CLASSES=/tmp/graft_r14a_classes
OUT=/tmp/offheap_ab
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop,q_dedup_spans_self,q_dedup_clusters,q_dedup_clusters_incremental,q_dedup_ngram,q_leakage_split,q_curation_pipeline,q_cdc_pipeline \
SPARK_GRAFT_BENCH_WARMUP=1 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_GC=1 \
SPARK_GRAFT_EXTRA_CONF="$OFFHEAP" \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  > "$OUT/sweep9_offheap.out" 2> "$OUT/sweep9_offheap.err"
echo "sweep9_offheap exit=$?"

echo "=== chain2: ALL DONE ($(date -u +%H:%M:%S)) ==="
