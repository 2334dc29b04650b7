#!/bin/bash
# Quiet-window watcher: probe host contention every ~4 min (graft.Probe,
# r7 LCG units, floor = Bench.QuietProbeMedianFloor); on TWO consecutive
# quiet probes with no /tmp/graft_busy lock, run the full 2-run bench at
# sf0.1 (the round's record attempt) and exit. Log: /tmp/quiet_watch.log
cd /root/repo || exit 1
CP="target/scala-2.13/classes:/opt/spark/jars/*"
streak=0
while true; do
  if [ -f /tmp/graft_busy ]; then
    echo "$(date +%H:%M:%S) busy-lock held, skipping probe" >> /tmp/quiet_watch.log
    streak=0
    sleep 240
    continue
  fi
  out=$(java -cp "$CP" graft.Probe 2>/dev/null)
  echo "$(date +%H:%M:%S) $out" >> /tmp/quiet_watch.log
  if echo "$out" | grep -q '"quiet":true'; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    # never race a foreign bench/verify JVM (e.g. the driver's own
    # round-end run): skip this trigger and keep watching
    # match actual JVMs only — a supervising agent's own command line
    # can contain these class names as prompt text
    if pgrep -f "java.*graft\.(Bench|Verify)" > /dev/null; then
      echo "$(date +%H:%M:%S) quiet but a graft JVM is running — deferring" >> /tmp/quiet_watch.log
      streak=1
      sleep 240
      continue
    fi
    echo "$(date +%H:%M:%S) QUIET WINDOW — launching bench" >> /tmp/quiet_watch.log
    touch /tmp/graft_bench_running
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=2 \
      sbt -batch "runMain graft.Bench" > /tmp/bench_quiet.log 2>&1
    echo "$(date +%H:%M:%S) bench exit=$? (see /tmp/bench_quiet.log)" >> /tmp/quiet_watch.log
    rm -f /tmp/graft_bench_running
    exit 0
  fi
  sleep 240
done
