#!/bin/bash
# Interleaved fresh-JVM A/B: alternate configs, report per-pass JSON lines.
# Usage: ab_bench.sh <queries-csv> <confA> <confB> <pairs>
set -u
Q="$1"; CA="$2"; CB="$3"; PAIRS="${4:-3}"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
run() {
  local tag="$1" conf="$2" i="$3"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$Q" SPARK_GRAFT_CONF="$conf" \
  SPARK_GRAFT_BENCH_QUERIES_OUT=/tmp/ab_${tag}_${i}.json \
  java -Xmx48g --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>/dev/null | tail -2 | head -1 | \
    python3 -c "import json,sys; d=json.load(sys.stdin); print('$tag pass $i:', {k: round(v,2) for k,v in d['queries'].items()}, 'load', d.get('load_med','?'))"
}
for i in $(seq 1 "$PAIRS"); do
  run A "$CA" "$i"
  run B "$CB" "$i"
done
