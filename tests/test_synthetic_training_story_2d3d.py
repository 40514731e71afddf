"""Accuracy story for the 2D-3D (image<->cloud) branch.

The reference's largest sub-project (Diff-Reg-2d3d, README.md:96 RR 88.3 @
steps=1 / 95.0 @ steps=20 on RGB-D Scenes V2) has whole-pipeline torch
parity tests here but needed trained evidence. Stand-in: a committed
training run (tools/train_synthetic_2d3d.py) streaming synthetic
image<->cloud scenes through the full trainval path, evaluated with the
reference protocol — IR@0.05 m, FMR, and RR via PnP-RANSAC
(reference Diff-Reg-2d3d eval.py / vision3d registration metrics).

The metrics.json under snapshot/train-synthetic-2d3d is produced on the
real chip and committed; this test only validates the committed artifact.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

METRICS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "snapshot", "train-synthetic-2d3d", "metrics.json")


@pytest.fixture(scope="module")
def metrics():
    if not os.path.exists(METRICS):
        pytest.skip("snapshot/train-synthetic-2d3d/metrics.json missing — "
                    "run tools/train_synthetic_2d3d.py (chip session r5d leg 3)")
    with open(METRICS) as f:
        return json.load(f)


def test_complete_artifact(metrics):
    assert not metrics.get("partial", False), \
        "committed 2D-3D story artifact is a partial run — finalize it"


def test_heldout_ir_improves(metrics):
    assert metrics["heldout_ir_after"] > metrics["heldout_ir_before"] + 0.10


def test_heldout_rr_improves(metrics):
    assert metrics["heldout_rr_after"] >= metrics["heldout_rr_before"]
    assert metrics["heldout_rr_after"] >= 0.25, metrics["heldout_rr_after"]


def test_train_loss_falls(metrics):
    losses = [l for _, l in metrics["train_curve"]]
    assert len(losses) >= 10
    head = np.mean(losses[:3])
    tail = np.mean(losses[-3:])
    assert tail < 0.8 * head, f"train loss did not fall: {head:.4f} -> {tail:.4f}"


def test_val_curve_trend(metrics):
    rrs = [r for _, r, _ in metrics["val_curve"]]
    assert max(rrs) >= 0.25
