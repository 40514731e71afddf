#!/bin/bash
# Round-5 chip session B: the two remaining training stories, run
# back-to-back so the chip never idles (VERDICT r4 items 3 + the 2D-3D
# trained-evidence gap). Launch AFTER the 3D story run releases the chip.
set -x
cd "$(dirname "$0")/.."

# 4DMatch deformable story (~100 min): NFMR/IR on held-out deformable scenes
DIFFREG_VAL_BATCHES=4 DIFFREG_RATE_EST=12 timeout 7500 \
  python tools/train_synthetic_4d.py 100 8 snapshot/train-synthetic-4d \
  2>&1 | tail -30

# 2D-3D story (~55 min): RR/IR/FMR via DDIM + fine matching + device PnP
DIFFREG_VAL_BATCHES=2 DIFFREG_RATE_EST=3 timeout 4200 \
  python tools/train_synthetic_2d3d.py 55 4 snapshot/train-synthetic-2d3d \
  2>&1 | tail -30
