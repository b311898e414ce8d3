#!/bin/bash
# Round-14 measurement chain (serialized so runs never contend for CPU):
#   1. Off-heap phase 2: 3× (8g heap + 4g off-heap) over the sf10 span pair,
#      plus a third same-day 8g control -> 3v3 adjudication vs control_{1,2}.
#   2. Count-first prefilter A/B at sf1 (2 runs/arm).
#   3. sf1 floors for the 9 heavies.
# Each sub-script is already one-JVM-per-run with GC between reps.
set -u
cd /root/repo

echo "=== chain: offheap phase 2 ($(date -u +%H:%M:%S)) ==="
bash tools/offheap_ab2.sh

echo "=== chain: extra 8g control ($(date -u +%H:%M:%S)) ==="
CLASSES=/tmp/graft_r13_classes
OUT=/tmp/offheap_ab
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
SPARK_GRAFT_BENCH_ONLY=q_dedup_spans,q_dedup_span_drop \
SPARK_GRAFT_BENCH_WARMUP=1 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_GC=1 \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  > "$OUT/control_3.out" 2> "$OUT/control_3.err"
echo "control_3 exit=$?"

echo "=== chain: prefilter sf1 A/B ($(date -u +%H:%M:%S)) ==="
bash tools/prefilter_ab.sh

echo "=== chain: sf1 floors ($(date -u +%H:%M:%S)) ==="
bash tools/floors_sf1.sh

echo "=== chain: ALL DONE ($(date -u +%H:%M:%S)) ==="
