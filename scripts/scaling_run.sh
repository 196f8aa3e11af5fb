#!/bin/bash
# Interleaved median-of-3 measurement for the N=2 vs 4N=8 scaling pair.
# Ambient load on this shared host swings single measurements ~2x, so each
# round measures both configs back-to-back and the medians are compared.
set -euo pipefail
ROWS="${1:-500000}"
cd "$(dirname "$0")/.."
OUT=target/scaling-results.jsonl
: > "$OUT"
for round in 1 2 3; do
  for cores in 8 2; do
    J=$(sbt -batch "runMain graft.ScalingBench measure $cores $ROWS" | grep -o '\[scaling-json\] .*' | sed 's/\[scaling-json\] //')
    echo "$J" >> "$OUT"
    echo "round=$round $J"
  done
done
python3 - "$OUT" <<'PY'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {}
for r in rows:
    by.setdefault(r["cores"], []).append(r["sec"])
t8 = statistics.median(by[8]); t2 = statistics.median(by[2])
print(json.dumps({"t2_all": by[2], "t8_all": by[8],
                  "t2_median": t2, "t8_median": t8,
                  "efficiency": round((t2/t8)/4, 3)}))
PY
