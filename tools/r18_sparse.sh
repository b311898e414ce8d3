#!/bin/bash
# Round-18 winnow-prefilter WIN-CASE demonstration on a span-SPARSE
# corpus (the shape the prefilter exists for — the amplified bench
# corpora are duplicate-saturated, cand_frac 94-99.9%, where the
# density guard correctly bails; see /tmp/r18_chain/density.out).
# Corpus: SparseCorpusGen over /tmp/graft_sf10 (same 500k docs / char
# volume, per-doc token suffix on 99% of docs, 1% verbatim).
# Arms (interleaved, split JVMs, classes frozen post-bloom-gate at
# GRAFT_AB_CLASSES): base (winnow off) vs winnow on (Bloom-gated
# over-cap count, the default) vs winnow on with the Bloom disabled
# (bloomMax=0) to price the gate itself.
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r18b_classes}
OUT=/tmp/r18_sparse
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

echo "=== leg 0: build the sparse corpus ($(date -u +%H:%M:%S)) ==="
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.SparseCorpusGen \
  /tmp/graft_sf10 /tmp/graft_sparse10 100 \
  > "$OUT/gen.out" 2> "$OUT/gen.err"
echo "gen exit=$? ($(date -u +%H:%M:%S))"

echo "=== leg 1: candidate density on the sparse corpus ($(date -u +%H:%M:%S)) ==="
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.SpanDensityProbe \
  /tmp/graft_sparse10 \
  > "$OUT/density.out" 2> "$OUT/density.err"
echo "density exit=$? ($(date -u +%H:%M:%S))"
cat "$OUT/density.out"

echo "=== leg 2: sparse-corpus A/B, interleaved ($(date -u +%H:%M:%S)) ==="
for i in 1 2; do
  run_bench sparse_base_$i    /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP"
  run_bench sparse_winnow_$i  /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP;$WINNOW"
  run_bench sparse_nobloom_$i /tmp/graft_sparse10 "$SPAN" 1 2 "$OFFHEAP;$WINNOW;$NOBLOOM"
done
echo "=== sparse chain ALL DONE ($(date -u +%H:%M:%S)) ==="
