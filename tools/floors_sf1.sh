#!/bin/bash
# Round-14 sf1 floors for the 9 heavy queries (VERDICT r13 item 6): the
# standing mid-scale adjudication regime — sf1 is where span-family
# changes ARE measurable (rep spread <10%), unlike the one-JVM sf10
# spill regime (47% control spread, SCALE_span_r13.json). One JVM PER
# QUERY (isolated floors), warmup=1 + 2 measured reps, GC between.
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r14a_classes}
OUT=/tmp/floors_sf1
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf1
export SPARK_GRAFT_BENCH_WARMUP=1
export SPARK_GRAFT_BENCH_REPS=2
export SPARK_GRAFT_BENCH_GC=1
mkdir -p "$OUT"
for q in q_dedup_spans q_dedup_span_drop q_dedup_spans_self \
         q_dedup_clusters q_dedup_clusters_incremental q_dedup_ngram \
         q_leakage_split q_curation_pipeline q_cdc_pipeline; do
  SPARK_GRAFT_BENCH_ONLY="$q" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/$q.out" 2> "$OUT/$q.err"
  echo "$q exit=$?"
done
echo DONE
