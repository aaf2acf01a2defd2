#!/bin/bash
# Same-boot scaling probe of the flagship production postures at
# sf0.1 / sf1 / sf10 (ScaleGen replicas: 10x / 100x sf0.1 rows in
# documents, embeddings and events). Runs graft.Bench with the standard
# probe-harness shape (local[8], min-of-three, anchors) once per SF and
# leaves one JSON line per SF in $OUT_DIR. Usage:
#   tools/scale_probe.sh [sf1_dir] [sf10_dir] [out_dir]
set -e
cd "$(dirname "$0")/.."
SF1="${1:-/tmp/sf1}"
SF10="${2:-/tmp/sf10}"
OUT="${3:-/tmp/scale_probe}"
mkdir -p "$OUT"
# The at-scale production postures (VERDICT r6 item 1) + the three
# event-analytics queries the sf1 round already tracked.
QUERIES="q52,q101,q102,q111,q121,q128b,q130b,q131,q137,q138,q132,q133,q136"
for sf in /root/testdata/sf0.1 "$SF1" "$SF10"; do
  tag=$(basename "$sf" | sed 's/^sf0.1$/sf01/')
  echo "=== probing $sf ==="
  SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY="$QUERIES" \
    SPARK_GRAFT_TELEMETRY="$OUT/telemetry_$tag.jsonl" SPARK_DRIVER_MEM=24g \
    tools/run_local.sh graft.Bench 2> "$OUT/stderr_$tag.log" \
    | tail -1 > "$OUT/bench_$tag.json"
  cat "$OUT/bench_$tag.json"
done
echo "probe lines in $OUT"
