"""The training-story eval protocols must be ATTAINABLE on their scenes.

Guards the round-5 fix of the 4D story's resolution ceiling: the absolute
4DMatch thresholds (0.04 m IR/recall, 0.1 m blend radius) require the
reference's scene-to-voxel ratio (first_subsampling_dl 0.01 -> coarse voxel
= one threshold, configs/test/4dmatch.yaml:9). If scene generation, the
pyramid builder, or the metrics drift so a PERFECT matcher can no longer
score high, every chip training run on top is wasted — this is the cheap
canary (tools/oracle_ceiling.py holds the measured numbers).
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.oracle_ceiling import oracle_2d3d, oracle_4d
from tools.train_synthetic_4d import FLOW_AMP, SCENE_SCALE


def test_4d_story_protocol_attainable():
    ir, nf = oracle_4d(SCENE_SCALE, FLOW_AMP, seeds=(0,), batch=4)
    assert ir >= 0.9, f"oracle IR@0.04 collapsed: {ir}"
    assert nf >= 0.7, f"oracle NFMR collapsed: {nf}"


def test_4d_legacy_scale_is_ceiling_bound():
    # documents WHY the story rescaled: at the old scale even a perfect
    # matcher scores ~0.2/0.15 — any "plateau" there is the protocol
    ir, nf = oracle_4d(1.0, 0.05, seeds=(0,), batch=4)
    assert ir < 0.5
    assert nf < 0.4


def test_2d3d_story_protocol_attainable():
    ir, rr = oracle_2d3d(seeds=(0,), batch=2)
    assert ir >= 0.9, f"oracle IR@0.05 collapsed: {ir}"
    assert rr >= 0.9, f"oracle RR collapsed: {rr}"
