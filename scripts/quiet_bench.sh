#!/bin/bash
# Wait for a quiet window (1-minute loadavg below threshold), then run the
# round bench twice and the 1M-row interleaved scaling medians. This box's
# ambient load swings wall times ~3x, so all reported numbers must come
# from a quiet window (see BENCH/BASELINE.md protocol).
#
# Usage: nohup bash scripts/quiet_bench.sh &   (results in target/quiet/)
set -u
cd "$(dirname "$0")/.."
mkdir -p target/quiet
TH="${QUIET_THRESHOLD:-2.0}"
ROWS="${SCALING_ROWS:-1000000}"
echo "waiting for load < $TH ..." > target/quiet/status
for i in $(seq 1 720); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $L < $TH else 0)")
  if [ "$ok" = "1" ]; then break; fi
  sleep 30
done
echo "quiet at $(date), load=$(cut -d' ' -f1-3 /proc/loadavg)" >> target/quiet/status

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '{"metric".*' | tail -1 > target/quiet/bench1.json
echo "bench1 done $(date), load=$(cut -d' ' -f1-3 /proc/loadavg)" >> target/quiet/status

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '{"metric".*' | tail -1 > target/quiet/bench2.json
echo "bench2 done $(date), load=$(cut -d' ' -f1-3 /proc/loadavg)" >> target/quiet/status

bash scripts/scaling_run.sh "$ROWS" > target/quiet/scaling.log 2>&1
echo "scaling done $(date), load=$(cut -d' ' -f1-3 /proc/loadavg)" >> target/quiet/status
