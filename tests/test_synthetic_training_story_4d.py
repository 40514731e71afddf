"""Accuracy story for the 4DMatch (deformable) branch.

VERDICT r4 item 3: the deformable branch — half the published headline
(reference README.md:45, NFMR 90.25) — needs trained evidence. With the
released weights and the real 4DMatch split unreachable offline, the
stand-in is a committed training run (tools/train_synthetic_4d.py) over
streamed synthetic deformable scenes, evaluated with the reference 4DMatch
tester protocol: flow-corrected IR@0.04 m and NFMR via anchor-motion
blending (reference Diff-Reg-4dmatch lib/tester.py + datasets/utils.py
blend_anchor_motion).

The metrics.json under snapshot/train-synthetic-4d is produced on the real
chip and committed; this test only validates the committed artifact.
Thresholds are ratcheted to just under the committed run so a silent
regression of the training path fails CI (VERDICT r4 "weak" item 3).
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

METRICS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "snapshot", "train-synthetic-4d", "metrics.json")


@pytest.fixture(scope="module")
def metrics():
    if not os.path.exists(METRICS):
        pytest.skip("snapshot/train-synthetic-4d/metrics.json missing — "
                    "run tools/train_synthetic_4d.py (chip session r5d leg 2)")
    with open(METRICS) as f:
        return json.load(f)


def test_complete_artifact(metrics):
    assert not metrics.get("partial", False), \
        "committed 4D story artifact is a partial run — finalize it"


def test_heldout_nfmr_improves(metrics):
    assert metrics["heldout_nfmr_after"] >= 0.30, metrics["heldout_nfmr_after"]
    assert metrics["heldout_nfmr_after"] > metrics["heldout_nfmr_before"] + 0.15


def test_heldout_ir_improves(metrics):
    assert metrics["heldout_ir_after"] > metrics["heldout_ir_before"] + 0.10


def test_train_loss_falls(metrics):
    losses = [l for _, l in metrics["train_curve"]]
    assert len(losses) >= 10
    head = np.mean(losses[:3])
    tail = np.mean(losses[-3:])
    assert tail < 0.7 * head, f"train loss did not fall: {head:.4f} -> {tail:.4f}"


def test_val_curve_trend(metrics):
    nfmrs = [v for _, _, v in metrics["val_curve"]]
    assert max(nfmrs) >= 0.30
    assert np.mean(nfmrs[len(nfmrs) // 2:]) > nfmrs[0]
