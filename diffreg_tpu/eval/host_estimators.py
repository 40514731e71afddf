"""Host (Open3D / OpenCV) pose estimators for metric-audit parity runs.

The device estimators (`eval/ransac.py`, `eval/pnp.py`) are the pairs/sec
path; when auditing benchmark numbers against the reference tables the pose
solver itself must be protocol-exact, or "our RANSAC differs" is conflated
with "our network differs". These twins reproduce the reference's host
estimators:

- ``ransac_pose_open3d``: Open3D correspondence-RANSAC with the reference's
  exact criteria (Diff-Reg-3dmatch/models/loss.py:13-24 — point-to-point,
  ransac_n=3, RANSACConvergenceCriteria(50000, 1000)).
- ``pnp_pose_opencv``: cv2.solvePnPRansac with the reference's settings
  (Diff-Reg-2d3d/vision3d/utils/opencv.py:10-60 — SOLVEPNP_P3P, 5000
  iterations, 8 px tolerance, (v, u)->(u, v) pixel transposition).

Both are import-guarded: with the library absent the functions raise a
clear error only when actually called, and ``has_open3d``/``has_opencv``
let callers (testers, the ``--parity-eval`` path) fall back to the device
estimators.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def has_open3d() -> bool:
    try:
        import open3d  # noqa: F401
        return True
    except ImportError:
        return False


def has_opencv() -> bool:
    try:
        import cv2  # noqa: F401
        return True
    except ImportError:
        return False


def ransac_pose_open3d(
    src_points: np.ndarray,     # [N, 3] source cloud (correspondence points)
    tgt_points: np.ndarray,     # [M, 3] target cloud
    correspondences: np.ndarray,  # [C, 2] (src_idx, tgt_idx) int pairs
    distance_threshold: float = 0.05,
    ransac_n: int = 3,
    max_iteration: int = 50000,
    confidence: int = 1000,
) -> np.ndarray:
    """Open3D correspondence-RANSAC -> [4, 4] transform (reference
    models/loss.py:13-24). ``confidence`` lands in the second criteria slot
    the way the reference passes it (the open3d API reads it as the
    confidence parameter; the reference passes 1000, i.e. never early-stops
    on confidence)."""
    import open3d as o3d

    def cloud(arr):
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(np.asarray(arr, np.float64))
        return pc

    corres = o3d.utility.Vector2iVector(
        np.asarray(correspondences, np.int32))
    result = o3d.pipelines.registration.registration_ransac_based_on_correspondence(
        source=cloud(src_points),
        target=cloud(tgt_points),
        corres=corres,
        max_correspondence_distance=distance_threshold,
        estimation_method=o3d.pipelines.registration.TransformationEstimationPointToPoint(False),
        ransac_n=ransac_n,
        criteria=o3d.pipelines.registration.RANSACConvergenceCriteria(
            max_iteration, confidence),
    )
    return np.asarray(result.transformation)


def pnp_pose_opencv(
    corr_points: np.ndarray,    # [C, 3] 3D points
    corr_pixels: np.ndarray,    # [C, 2] pixels, (v, u) order when transposed
    intrinsics: np.ndarray,     # [3, 3]
    distortion: Optional[np.ndarray] = None,
    num_iterations: int = 5000,
    distance_tolerance: float = 8.0,
    transposed: bool = True,
) -> Optional[np.ndarray]:
    """cv2.solvePnPRansac -> [4, 4] camera-from-cloud transform, or None
    with <4 correspondences (reference vision3d/utils/opencv.py:10-60)."""
    import cv2

    corr_points = np.asarray(corr_points, np.float64)
    corr_pixels = np.asarray(corr_pixels, np.float64)
    if corr_points.shape[0] < 4:
        return None
    if transposed:
        corr_pixels = corr_pixels[..., ::-1].copy()   # (v, u) -> (u, v)
    if distortion is None:
        distortion = np.zeros((4, 1))

    ok, axis_angle, translation, _ = cv2.solvePnPRansac(
        corr_points,
        corr_pixels,
        np.asarray(intrinsics, np.float64),
        distortion,
        iterationsCount=num_iterations,
        reprojectionError=distance_tolerance,
        flags=cv2.SOLVEPNP_P3P,
    )
    if not ok or axis_angle is None:
        return None
    rotation, _ = cv2.Rodrigues(axis_angle)
    transform = np.eye(4)
    transform[:3, :3] = rotation
    transform[:3, 3] = translation[:, 0]
    return transform
