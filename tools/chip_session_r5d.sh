#!/bin/bash
# Round-5 chip session D: the r5c plan re-budgeted after the tunnel outage
# ate the first half of the round. Same three training-story legs, shorter
# horizons so all three fit the remaining wall clock (the cosine schedule
# adapts to the requested minutes):
#   1. 3D story, fresh (the r5 resume checkpoints died with the machine;
#      the r4b run proved 0.9375 is reachable in ~73 min at this rate)
#   2. 4DMatch story, fresh at the reference-matched scene scale
#   3. 2D-3D story — first completed run
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

# ---- leg 1: 3D story, fresh (~70 min train) ----------------------------
DIFFREG_VAL_BATCHES=2 DIFFREG_RATE_EST=11 timeout 5700 \
  python tools/train_synthetic.py 70 8 snapshot/train-synthetic-r5 \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-r5; then
  timeout 1500 python tools/train_synthetic.py finalize \
    snapshot/train-synthetic-r5 8 2>&1 | tail -5
fi
touch /tmp/leg1.done

# ---- leg 2: 4D story, fresh at the rescaled geometry (~80 min train) ----
rm -rf snapshot/train-synthetic-4d
DIFFREG_VAL_BATCHES=4 DIFFREG_RATE_EST=4 timeout 6300 \
  python tools/train_synthetic_4d.py 80 8 snapshot/train-synthetic-4d \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-4d; then
  timeout 1500 python tools/train_synthetic_4d.py finalize \
    snapshot/train-synthetic-4d 8 2>&1 | tail -5
fi
touch /tmp/leg2.done

# ---- leg 3: 2D-3D story (~40 min train) ---------------------------------
DIFFREG_VAL_BATCHES=2 DIFFREG_RATE_EST=3 timeout 3600 \
  python tools/train_synthetic_2d3d.py 40 4 snapshot/train-synthetic-2d3d \
  2>&1 | tail -40
if needs_finalize snapshot/train-synthetic-2d3d; then
  timeout 1500 python tools/train_synthetic_2d3d.py finalize \
    snapshot/train-synthetic-2d3d 4 2>&1 | tail -5
fi
touch /tmp/leg3.done

echo "r5d session complete"
