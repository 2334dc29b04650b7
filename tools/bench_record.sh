#!/bin/bash
# Auto-retry wrapper for earning a record_valid=true full-suite bench
# artifact (r14 verdict #1; storm-resilient rework r15 verdict #1):
# probe for a quiet window, run the full Bench suite with the harness's
# own MID-RUN early abort armed (SPARK_GRAFT_RECORD_ABORT=1 — Bench
# exits 3 the moment any timed pass shows in-run steal past the record
# ceiling or a between-run probe leaves the quiet band, so a doomed
# attempt costs minutes, not the full ~12), and keep the artifact ONLY
# if it self-declares record_valid=true. Since r16 the harness itself
# routes a completed-but-invalid run to BENCH_DETAIL_INVALID.json, so
# the committed BENCH_DETAIL.json can never carry contaminated bytes —
# this wrapper adds no judgment of its own.
#
# Storms on this host arrive MID-window behind quiet opening probes
# (12 r15 attempts + 2 judge sessions all died that way), so the
# wrapper is built for a LONG horizon: many attempts, exponential
# cooldown on consecutive noise (base COOL, doubling to COOL_MAX,
# reset after any attempt that actually ran), cheap aborted attempts.
#
# Usage: tools/bench_record.sh [max_attempts] [cooldown_sec] [cooldown_max]
# Runs from the repo root. Requires compiled classes (sbt compile).
set -u
cd "$(dirname "$0")/.."
MAX=${1:-40}
COOL=${2:-180}
COOL_MAX=${3:-1800}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

cool="$COOL"
for i in $(seq 1 "$MAX"); do
  probe=$(java -cp "$CP" graft.Probe 2>/dev/null | tail -1)
  # guarded parse (r15 advice #3): a non-JSON last line must read as a
  # DISTINCT logged condition, not as an endlessly-noisy window
  quiet=$(echo "$probe" | python3 -c 'import json,sys; print(json.load(sys.stdin)["quiet"])' 2>/dev/null || echo parse_error)
  echo "[bench_record] attempt $i probe: $probe"
  if [ "$quiet" = "parse_error" ]; then
    echo "[bench_record] PROBE OUTPUT UNPARSEABLE (not a noisy-window verdict) — check graft.Probe stdout; cooling ${cool}s"
    sleep "$cool"
    cool=$(( cool * 2 > COOL_MAX ? COOL_MAX : cool * 2 ))
    continue
  fi
  if [ "$quiet" != "True" ]; then
    echo "[bench_record] window noisy, cooling down ${cool}s"
    sleep "$cool"
    cool=$(( cool * 2 > COOL_MAX ? COOL_MAX : cool * 2 ))
    continue
  fi
  cool="$COOL" # an attempt is running — reset the noise backoff
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RECORD_ABORT=1 \
    java -cp "$CP" $OPENS -Xmx96g graft.Bench \
    > "/tmp/bench_record_attempt_$i.out" 2>&1
  rc=$?
  last=$(grep -a '"metric":"total"' "/tmp/bench_record_attempt_$i.out" | tail -1)
  if [ "$rc" = "3" ]; then
    echo "[bench_record] attempt $i ABORTED mid-run (storm): $last"
    sleep "$cool"
    continue
  fi
  if [ -z "$last" ]; then
    echo "[bench_record] attempt $i produced no report (crash?)"
    tail -5 "/tmp/bench_record_attempt_$i.out"
    sleep "$cool"
    continue
  fi
  if [ -f BENCH_DETAIL_INVALID.json ]; then
    cp BENCH_DETAIL_INVALID.json "/tmp/bench_record_attempt_$i.json" 2>/dev/null
  fi
  verdict=$(echo "$last" | python3 -c 'import json,sys; d=json.load(sys.stdin); print(d.get("record_valid"), d.get("run_totals"))' 2>/dev/null || echo parse_error)
  echo "[bench_record] attempt $i verdict: $verdict"
  if echo "$last" | python3 -c 'import json,sys; sys.exit(0 if json.load(sys.stdin).get("record_valid") else 1)' 2>/dev/null; then
    echo "[bench_record] RECORD EARNED on attempt $i — artifact at BENCH_DETAIL.json"
    exit 0
  fi
  sleep "$cool"
done
echo "[bench_record] no record_valid window in $MAX attempts"
exit 1
