#!/bin/bash
# Round-19 winnow-prefilter A/B on the span-SPARSE corpus, after the
# anchor-value widening to 62 bits (pack of two independent 31-bit
# Rabin-Karp rolls). Round 18's attempt never completed and could not
# have won: 31-bit anchors are birthday-saturated at 500k docs, so the
# purpose-built sparse corpus still measured cand_frac 0.9547 and the
# density guard always bailed (evidence/winnow_ab/WINNOW_AB_r18.json).
# With 62-bit anchors the same corpus measures cand_frac 0.0099 - the
# true 1% sharing rate - so the gated path finally activates.
# Corpus: SparseCorpusGen output at /tmp/graft_sparse10 (500k docs,
# 99% bijectively token-suffixed, 1% verbatim; reused from r18 - the
# corpus does not depend on the anchor hash).
# Arms (interleaved, split JVMs, frozen classes at GRAFT_AB_CLASSES):
# base (winnow off) vs winnow on (default Bloom-gated over-cap count)
# vs winnow on with the Bloom disabled (bloomMax=0).
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r19_classes}
OUT=/tmp/r19_chain
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
NOBLOOM="spark.graft.span.winnowBlockedBloomMaxItems=0"

echo "=== sparse-corpus A/B, interleaved ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench sparse_base_$i    /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP"
  run_bench sparse_winnow_$i  /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP;$WINNOW"
  run_bench sparse_nobloom_$i /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP;$WINNOW;$NOBLOOM"
done
echo "=== r19 sparse chain ALL DONE ($(date -u +%H:%M:%S)) ==="
