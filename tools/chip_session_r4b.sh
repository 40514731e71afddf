#!/bin/bash
# Round-4 second chip session: A/B the fresh perf levers after the training
# run frees the chip. Serialized — never run concurrently with anything else
# touching the chip (contended runs read 3x slow).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_r4b}
mkdir -p "$OUT"

echo "== bench baseline (current defaults: rotary-half on, fused off)" | tee -a "$OUT/log"
timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_base.json"

echo "== fused rotary+proj A/B" | tee -a "$OUT/log"
DIFFREG_FUSED_ROTARY=1 timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_fused.json"

echo "== flash attention A/B (re-bench at head-pad 128 + rotary-half)" | tee -a "$OUT/log"
DIFFREG_FLASH=1 timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_flash.json"

echo "== percentile-K 80 A/B (backbone gather rows ~-20%)" | tee -a "$OUT/log"
DIFFREG_NEIGHBOR_PCT=80 timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_pct80.json"

echo "== batch-32 scaling point" | tee -a "$OUT/log"
timeout 2400 python bench.py 20 32 4096 2>&1 | tail -1 | tee "$OUT/bench_b32.json"

echo "== done: $OUT" | tee -a "$OUT/log"
