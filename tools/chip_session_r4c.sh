#!/bin/bash
# Round-4 chip session C: attention autotune + unmeasured operating points.
# Run AFTER the chip is idle (never during a training run — contended
# measurements read ~3x slow, ROADMAP measurement rules).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_r4c}
mkdir -p "$OUT"

note() { echo "== $*" | tee -a "$OUT/log"; }

note "flash-attention autotune (XLA vs Pallas tile sweep at bench shape)"
timeout 2400 python tools/tune_flash_attention.py 30 4 2>&1 \
  | tee "$OUT/tune_attention.txt" | tail -20

note "bench steps=1 operating point (published NFMR-85 tier)"
timeout 2400 python bench.py 1 16 4096 2>&1 | tail -1 | tee "$OUT/bench_steps1.json"

note "2d3d pipeline bench (first on-chip measurement)"
timeout 2400 python tools/bench_2d3d.py 10 4 2>&1 | tail -1 | tee "$OUT/bench_2d3d.json"

note "done: $OUT"
