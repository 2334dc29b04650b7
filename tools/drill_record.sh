#!/bin/bash
# Quiet-window retry wrapper for a ScaleCheck drill phase (r15 verdict
# #2: the 8-layer SCC phase still lacks a drill_valid=true number).
# Probes, runs the named drill when the window reads quiet, and stops
# the moment a run self-declares drill_valid=true for every phase it
# ran; exponential cooldown between noisy windows. The drill's own
# probe-bracketed verdict (same conjuncts as Bench's record_valid) is
# the only judge — this wrapper adds none of its own.
#
# Usage: tools/drill_record.sh <scalecheck-arg> [max_attempts] [cooldown] [cooldown_max]
set -u
cd "$(dirname "$0")/.."
ARG=${1:?scalecheck arg (e.g. scc1)}
MAX=${2:-12}
COOL=${3:-180}
COOL_MAX=${4:-1800}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

cool="$COOL"
for i in $(seq 1 "$MAX"); do
  probe=$(java -cp "$CP" graft.Probe 2>/dev/null | tail -1)
  quiet=$(echo "$probe" | python3 -c 'import json,sys; print(json.load(sys.stdin)["quiet"])' 2>/dev/null || echo parse_error)
  echo "[drill_record] attempt $i probe: $probe"
  if [ "$quiet" != "True" ]; then
    echo "[drill_record] window noisy (or probe unparseable: $quiet), cooling ${cool}s"
    sleep "$cool"
    cool=$(( cool * 2 > COOL_MAX ? COOL_MAX : cool * 2 ))
    continue
  fi
  cool="$COOL"
  out="/tmp/drill_record_${ARG}_$i.log"
  java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx16g -XX:ReservedCodeCacheSize=1g graft.ScaleCheck "$ARG" > "$out" 2>&1
  verdicts=$(grep -a 'SCALECHECK drill' "$out")
  echo "$verdicts"
  if [ -n "$verdicts" ] && ! echo "$verdicts" | grep -q '"drill_valid":false'; then
    echo "[drill_record] DRILL RECORD EARNED on attempt $i — log: $out"
    exit 0
  fi
  sleep "$cool"
done
echo "[drill_record] no drill_valid window in $MAX attempts"
exit 1
