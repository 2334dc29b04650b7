#!/bin/bash
# Auto-retry wrapper for earning a record_valid=true full-suite bench
# artifact (r14 verdict #1): probe for a quiet window, run the full
# Bench suite, keep the artifact ONLY if it self-declares
# record_valid=true; otherwise archive the attempt and retry after a
# cool-down. The floor/steal gates live in graft.Bench — this script
# adds no judgment of its own, it just refuses to start inside a window
# the probe already calls noisy (saving ~12 min per doomed attempt) and
# lets the artifact's own conjuncts decide afterwards.
#
# Usage: tools/bench_record.sh [max_attempts] [cooldown_sec]
# Runs from the repo root. Requires compiled classes (sbt compile).
set -u
cd "$(dirname "$0")/.."
MAX=${1:-12}
COOL=${2:-300}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

for i in $(seq 1 "$MAX"); do
  probe=$(java -cp "$CP" graft.Probe 2>/dev/null | tail -1)
  quiet=$(echo "$probe" | python3 -c 'import json,sys; print(json.load(sys.stdin)["quiet"])')
  echo "[bench_record] attempt $i probe: $probe"
  if [ "$quiet" != "True" ]; then
    echo "[bench_record] window noisy, cooling down ${COOL}s"
    sleep "$COOL"
    continue
  fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java -cp "$CP" $OPENS -Xmx96g graft.Bench \
    > "/tmp/bench_record_attempt_$i.out" 2>&1
  if [ ! -f BENCH_DETAIL.json ]; then
    echo "[bench_record] attempt $i produced no artifact (crash?)"
    tail -5 "/tmp/bench_record_attempt_$i.out"
    sleep "$COOL"
    continue
  fi
  cp BENCH_DETAIL.json "/tmp/bench_record_attempt_$i.json"
  verdict=$(python3 -c 'import json; d=json.load(open("BENCH_DETAIL.json")); print(d["record_valid"], d.get("record_invalid_reasons"), d.get("run_totals"))')
  echo "[bench_record] attempt $i verdict: $verdict"
  if python3 -c 'import json,sys; sys.exit(0 if json.load(open("BENCH_DETAIL.json"))["record_valid"] else 1)'; then
    echo "[bench_record] RECORD EARNED on attempt $i — artifact kept at BENCH_DETAIL.json (archived: /tmp/bench_record_attempt_$i.json)"
    exit 0
  fi
  # not a record: restore whatever was committed so the working tree
  # never carries a contaminated artifact (the 7c27153 failure mode)
  git checkout -- BENCH_DETAIL.json 2>/dev/null || true
  sleep "$COOL"
done
echo "[bench_record] no record_valid window in $MAX attempts"
exit 1
