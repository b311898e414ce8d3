#!/bin/bash
# Round-20 Bloom auto-size probe at 5M sparse docs (the r19 verdict's
# cliff scale): default confs (byte-ceiling-derived cap ~447M chars,
# gated path) vs the legacy 32M item cap (un-Bloomed fallback) vs
# winnow off. Corpus: SparseCorpusGen(/tmp/graft_docs5m) = 5M docs,
# 1% verbatim.
set -u
CLASSES=${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}
OUT=/tmp/r20_bloom
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
  SPARK_GRAFT_SF_DIR=/tmp/graft_sparse5m SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop \
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
LEGACY="spark.graft.span.winnowBlockedBloomMaxItems=32000000"

echo "=== r20 bloom probe ($(date -u +%H:%M:%S)) ==="
run_bench bloom_default "$OFFHEAP;$WINNOW"
run_bench bloom_legacy32m "$OFFHEAP;$WINNOW;$LEGACY"
run_bench bloom_base "$OFFHEAP"
echo "=== r20 bloom probe DONE ($(date -u +%H:%M:%S)) ==="
