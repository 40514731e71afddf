#!/bin/bash
# Round-5 chip session C: the three remaining training-story runs, queued so
# the chip never idles once the tunnel returns.
#   1. 3D story resume leg  — push best-val 0.854@24k toward >=0.9
#   2. 4DMatch story, FRESH at the reference-matched scene scale (the old
#      run's checkpoints are scale-incompatible; oracle ceiling study in
#      tools/train_synthetic_4d.py header)
#   3. 2D-3D story — first completed run (the r5b attempt died with the
#      tunnel: axon UNAVAILABLE at launch)
# Each leg is followed by a finalize pass IF the run left partial:true, so a
# mid-run tunnel death still yields a scoreable artifact from the best-val
# checkpoint on disk.
set -x
cd "$(dirname "$0")/.."

needs_finalize() {
  python - "$1" <<'EOF'
import json, sys, os
p = os.path.join(sys.argv[1], "metrics.json")
sys.exit(0 if (os.path.exists(p) and json.load(open(p)).get("partial")) else 1)
EOF
}

# ---- leg 1: 3D resume (~100 min) --------------------------------------
DIFFREG_RESUME=1 DIFFREG_VAL_BATCHES=2 DIFFREG_RATE_EST=11 timeout 7200 \
  python tools/train_synthetic.py 100 8 snapshot/train-synthetic-r5 \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-r5; then
  timeout 1800 python tools/train_synthetic.py finalize \
    snapshot/train-synthetic-r5 8 2>&1 | tail -5
fi

# ---- leg 2: 4D story, fresh at the rescaled geometry (~110 min) --------
rm -rf snapshot/train-synthetic-4d
DIFFREG_VAL_BATCHES=4 DIFFREG_RATE_EST=4 timeout 7800 \
  python tools/train_synthetic_4d.py 110 8 snapshot/train-synthetic-4d \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-4d; then
  timeout 1800 python tools/train_synthetic_4d.py finalize \
    snapshot/train-synthetic-4d 8 2>&1 | tail -5
fi

# ---- leg 3: 2D-3D story (~55 min) --------------------------------------
DIFFREG_VAL_BATCHES=2 DIFFREG_RATE_EST=3 timeout 4200 \
  python tools/train_synthetic_2d3d.py 55 4 snapshot/train-synthetic-2d3d \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-2d3d; then
  timeout 1800 python tools/train_synthetic_2d3d.py finalize \
    snapshot/train-synthetic-2d3d 4 2>&1 | tail -5
fi

echo "r5c session complete"
