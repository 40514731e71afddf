#!/bin/bash
# One serialized TPU session: bench A/B (head alignment), trace capture,
# synthetic training story. Run when the axon tunnel is up; never run
# anything else against the chip concurrently (contended runs read 3x slow).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_session_$(date +%H%M)}
mkdir -p "$OUT"

echo "== bench (head-align auto ON)" | tee -a "$OUT/log"
timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_aligned.json"

echo "== bench (align OFF A/B)" | tee -a "$OUT/log"
DIFFREG_ALIGN_HEADS=0 timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_unaligned.json"

echo "== bench (half-split rotary A/B)" | tee -a "$OUT/log"
DIFFREG_ROTARY_HALF=1 timeout 2400 python bench.py 20 16 4096 2>&1 | tail -1 | tee "$OUT/bench_rotary_half.json"

echo "== denoiser profile (padded vs unpadded attention)" | tee -a "$OUT/log"
timeout 1800 python tools/profile_denoiser.py 2>&1 | tail -20 | tee "$OUT/denoiser.txt"

echo "== synthetic training story (50 min)" | tee -a "$OUT/log"
timeout 3900 python tools/train_synthetic.py 50 8 snapshot/train-synthetic 2>&1 | tail -5 | tee "$OUT/train.txt"

echo "== done: $OUT" | tee -a "$OUT/log"
