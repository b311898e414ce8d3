#!/bin/bash
# Round-14 count-first rare-gram prefilter A/B (VERDICT r13 item 2).
# Arms toggle spark.graft.span.countPrefilter over the span pair, with
# boundedMinBytes=1 forcing the bounded index at sf1 (auto would pick
# the window form there, making the toggle a no-op — the same forcing
# the r13 packed-posting sf1 A/B used). Two runs per arm at sf1
# (warmup=1 + 3 reps each); sf10 runs are a separate phase so the
# regime decision from the off-heap A/B can be applied.
# Classes: /tmp/graft_r14a_classes (frozen post-prefilter tree).
set -u
CLASSES=${GRAFT_AB_CLASSES:-/tmp/graft_r14a_classes}
OUT=/tmp/prefilter_ab
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=${GRAFT_AB_SF:-/tmp/graft_sf1}
export SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop
export SPARK_GRAFT_BENCH_WARMUP=${GRAFT_AB_WARMUP:-1}
export SPARK_GRAFT_BENCH_REPS=${GRAFT_AB_REPS:-3}
export SPARK_GRAFT_BENCH_GC=1
BASECONF="spark.graft.span.boundedMinBytes=1"
EXTRA=${GRAFT_AB_EXTRA:-}
[ -n "$EXTRA" ] && BASECONF="$BASECONF;$EXTRA"
TAG=${GRAFT_AB_TAG:-sf1}
mkdir -p "$OUT"
for i in $(seq 1 "${GRAFT_AB_RUNS:-2}"); do
  SPARK_GRAFT_EXTRA_CONF="$BASECONF" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/${TAG}_base_$i.out" 2> "$OUT/${TAG}_base_$i.err"
  echo "${TAG}_base_$i exit=$?"
  SPARK_GRAFT_EXTRA_CONF="$BASECONF;spark.graft.span.countPrefilter=true" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    > "$OUT/${TAG}_pref_$i.out" 2> "$OUT/${TAG}_pref_$i.err"
  echo "${TAG}_pref_$i exit=$?"
done
echo DONE
