#!/bin/bash
# Round-18 winnowed-anchor-prefilter A/B (VERDICT r17 ask #1), split
# JVMs, classes frozen at the post-winnow tree (/tmp/graft_r18_classes).
# Arms toggle spark.graft.span.winnowPrefilter over the span pair at
# sf10 under the same off-heap regime as the r17 control
# (BENCH_GATE leg B: spill_ctrl 347-368 s), interleaved so machine
# drift can't bias an arm. A PRE-LEG probes candidate density (the
# quantity that decides the outcome) at sf0.1/sf1/sf10.
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r18_classes}
OUT=/tmp/r18_chain
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
WINNOW="spark.graft.span.winnowPrefilter=true"

echo "=== leg 0: candidate-density probe ($(date -u +%H:%M:%S)) ==="
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.SpanDensityProbe \
  /root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_sf10 \
  > "$OUT/density.out" 2> "$OUT/density.err"
echo "density exit=$? ($(date -u +%H:%M:%S))"
cat "$OUT/density.out"

echo "=== leg 1: span-pair sf10 winnow A/B, interleaved ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench winnow_ctrl_$i /tmp/graft_sf10 "$SPAN" 1 2 "$OFFHEAP"
  run_bench winnow_on_$i   /tmp/graft_sf10 "$SPAN" 1 2 "$OFFHEAP;$WINNOW"
done

echo "=== leg 2: sf1 spot check ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench winnow_sf1_ctrl_$i /tmp/graft_sf1 "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=1"
  run_bench winnow_sf1_on_$i   /tmp/graft_sf1 "$SPAN" 1 2 "spark.graft.span.boundedMinBytes=1;$WINNOW"
done
echo "=== chain ALL DONE ($(date -u +%H:%M:%S)) ==="
