#!/bin/bash
# Guarded single-JVM bench launch (verdict r17 item #2, made structural):
# the r17 round lost two full passes to a silent DOUBLE-RUN — a timed-out
# foreground launcher left an orphaned graft.Bench JVM that overlapped the
# background relaunch and both wrote the same artifact path; it was caught
# only by hand-diffing conflicting re-reads. This launcher makes that
# failure impossible instead of procedural:
#   1. REFUSES to start while any graft.Bench JVM is alive (exit 2);
#   2. writes the per-query sidecar to a UNIQUE tmp path;
#   3. atomically renames it into place ONLY on clean JVM exit, so a
#      killed/crashed pass can never replace or interleave the artifact;
#   4. runs scripts/rising_runs.py on the installed artifact (its exit
#      code — bit 1 rising cells, bit 2 high-state calibration — is this
#      script's exit code).
#
# Runs a fresh bare JVM (sbt bypassed — the build.sbt --add-opens list is
# replicated below, the ab_bench.sh template). Launch THIS script in the
# background from the start (nohup/&) and poll for the artifact: even if
# the launcher is killed, the guard + atomic rename mean a relaunch can
# only refuse (JVM still live) or install a complete artifact — never
# interleave two writers.
#
# Usage: bench_launch.sh [out_artifact]            (default bench_queries.json)
# Env (all optional): SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
# (default 32 — the committed-artifact width), SPARK_GRAFT_BENCH_ONLY,
# SPARK_GRAFT_CONF, SPARK_GRAFT_BENCH_RUNS.
set -u
OUT="${1:-/root/repo/bench_queries.json}"
LIVE=$(pgrep -f 'graft\.Bench' || true)
if [ -n "$LIVE" ]; then
  echo "bench_launch: REFUSING to start — live graft.Bench JVM(s): $LIVE" >&2
  echo "bench_launch: kill them (or wait) and relaunch; two concurrent" \
       "benches contaminate each other AND the artifact." >&2
  exit 2
fi
TMP=$(mktemp "${OUT}.XXXXXX")
LOG="${OUT%.json}.stdout"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_QUERIES_OUT="$TMP" \
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
  -cp "$CP" graft.Bench > "$TMP.out" 2> "$TMP.err"
rc=$?
if [ $rc -eq 0 ] && [ -s "$TMP" ]; then
  mv -f "$TMP" "$OUT"
  mv -f "$TMP.out" "$LOG"
  rm -f "$TMP.err"
  tail -1 "$LOG"
  python3 /root/repo/scripts/rising_runs.py "$OUT"
  exit $?
else
  echo "bench_launch: FAILED rc=$rc — artifact NOT installed" >&2
  echo "bench_launch: tmp sidecar: $TMP  stderr: $TMP.err" >&2
  exit 1
fi
