"""GT node<->patch overlap machinery tests."""
import numpy as np
import pytest

from diffreg_tpu.data.collate2d3d import node_patch_overlaps


def test_overlaps_identity_scene(rng):
    """Cloud == back-projected depth subset: each node should overlap the
    patches its members project into, with high ratios."""
    h, w, stride = 16, 16, 8
    fx = fy = 20.0
    cx, cy = w / 2, h / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = np.full(h * w, 2.0, np.float32)
    x = (uu.reshape(-1) - cx) * z / fx
    y = (vv.reshape(-1) - cy) * z / fy
    img_points = np.stack([x, y, z], -1).astype(np.float32)
    img_valid = np.ones(h * w, bool)

    # cloud = all image points (identity transform); nodes = 4 patch centers
    points = img_points.copy()
    patch_centers = img_points.reshape(2, 8, 2, 8, 3).mean(axis=(1, 3)).reshape(4, 3)
    nodes = patch_centers

    node_idx, patch_idx, min_ov, max_ov, valid = node_patch_overlaps(
        points, nodes, img_points, img_valid, np.eye(4, dtype=np.float32), K,
        (h, w), stride, matching_radius_3d=0.2, max_pairs=64)

    got = {(int(n), int(p)) for n, p, v in zip(node_idx, patch_idx, valid) if v}
    # node i must overlap patch i (geometric identity)
    for i in range(4):
        assert (i, i) in got
    # and the diagonal overlaps should be the strongest
    diag = {(n, p): m for n, p, m, v in zip(node_idx, patch_idx, max_ov, valid) if v}
    for i in range(4):
        off = [m for (n, p), m in diag.items() if n == i and p != i]
        if off:
            assert diag[(i, i)] >= max(off) - 1e-6


def test_overlaps_empty_depth():
    out = node_patch_overlaps(
        np.zeros((10, 3), np.float32), np.zeros((2, 3), np.float32),
        np.zeros((64, 3), np.float32), np.zeros(64, bool),
        np.eye(4, dtype=np.float32), np.eye(3, dtype=np.float32),
        (8, 8), 8)
    assert not out[4].any()
