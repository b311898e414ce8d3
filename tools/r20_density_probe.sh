#!/bin/bash
# Round-20 density pre-probe A/B on a duplicate-SATURATED corpus
# (/tmp/graft_docs500k, DocAmplify x100 of sf0.1 - within-copy span
# structure preserved, so the winnow guard must bail): winnow OFF
# (base) vs winnow ON with the sampled pre-probe (default 0.01) vs
# winnow ON with the pre-probe disabled (full anchor pass before the
# bail - the r19 guard cost). Guard cost = arm minus base.
set -u
CLASSES=${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}
OUT=/tmp/r20_density
OFFHEAP="spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=4g"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
mkdir -p "$OUT"

run_bench() { # tag extraconf
  local tag=$1 extra=$2
  SPARK_GRAFT_SF_DIR=/tmp/graft_docs500k SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop \
  SPARK_GRAFT_BENCH_WARMUP=1 SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_GC=1 SPARK_GRAFT_EXTRA_CONF="$extra" \
  SPARK_GRAFT_BENCH_DETAIL="$OUT/${tag}.detail.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/${tag}.out" 2> "$OUT/${tag}.err"
  echo "${tag} exit=$? ($(date -u +%H:%M:%S))"
}

WINNOW="spark.graft.span.winnowPrefilter=true"
NOPROBE="spark.graft.span.winnowDensitySampleFrac=0"

echo "=== r20 density probe A/B ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench dens_base_$i     "$OFFHEAP"
  run_bench dens_preprobe_$i "$OFFHEAP;$WINNOW"
  run_bench dens_fullpass_$i "$OFFHEAP;$WINNOW;$NOPROBE"
done
echo "=== r20 density probe DONE ($(date -u +%H:%M:%S)) ==="
