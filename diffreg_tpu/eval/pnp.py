"""PnP-RANSAC — device-parallel perspective-n-point pose.

Replaces the host OpenCV solvePnPRansac (reference vision3d/utils/
opencv.py:10-60: 50k sequential iterations, 8 px tolerance) with a fully
batched scheme:

  hypothesis = 6-correspondence DLT (12x12 symmetric eigh -> projection
  matrix, nearest-rotation extraction via Horn), scored by reprojection
  inliers; best hypothesis refined by re-solving weighted DLT on inliers.

All hypotheses evaluate in parallel on the MXU. Returns cam-from-cloud
(R, t) like the reference's extrinsics convention.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.procrustes import _horn_rotation


class PnPResult(NamedTuple):
    rotation: jnp.ndarray     # [3, 3]
    translation: jnp.ndarray  # [3, 1]
    inlier_count: jnp.ndarray
    success: jnp.ndarray      # bool: >= 4 inliers and finite pose


def _dlt_projection(points, pixels, w):
    """Weighted DLT for P in x ~ P X. points [N,3], pixels [N,2] (u,v in
    *normalized camera coords*), w [N]. Returns P [3,4]."""
    n = points.shape[0]
    x = jnp.concatenate([points, jnp.ones((n, 1))], axis=1)  # [N, 4]
    u = pixels[:, 0:1]
    v = pixels[:, 1:2]
    zeros = jnp.zeros((n, 4))
    # rows: [X 0 -u X], [0 X -v X]
    r1 = jnp.concatenate([x, zeros, -u * x], axis=1)         # [N, 12]
    r2 = jnp.concatenate([zeros, x, -v * x], axis=1)
    a = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # [2N, 12]
    ata = jnp.matmul(a.T, a, precision=jax.lax.Precision.HIGHEST)  # [12, 12]
    _, vecs = jnp.linalg.eigh(ata)
    p = vecs[:, 0].reshape(3, 4)                              # smallest eigvec
    return p


def _pose_from_projection(p):
    """Decompose P=[M|m] (normalized coords: K=I) into (R, t) with det>0."""
    m3 = p[:, :3]
    det = jnp.linalg.det(m3)
    sign = jnp.where(det < 0, -1.0, 1.0)
    p = p * sign
    m3 = p[:, :3]
    scale = jnp.cbrt(jnp.clip(jnp.linalg.det(m3), 1e-12, None))
    mn = m3 / scale
    # nearest rotation maximizing tr(R^T mn)
    r = _horn_rotation(mn[None])[0]
    t = (p[:, 3] / scale).reshape(3, 1)
    return r, t


def _reproject_inliers(r, t, points, pixels_px, intrinsics, valid, thr_px):
    cam = points @ r.T + t.reshape(1, 3)
    z = jnp.clip(cam[:, 2], 1e-6, None)
    u = cam[:, 0] / z * intrinsics[0, 0] + intrinsics[0, 2]
    v = cam[:, 1] / z * intrinsics[1, 1] + intrinsics[1, 2]
    err2 = (u - pixels_px[:, 0]) ** 2 + (v - pixels_px[:, 1]) ** 2
    return (err2 < thr_px**2) & valid & (cam[:, 2] > 0)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def pnp_ransac(
    rng,
    points3d,        # [C, 3] cloud-frame points (padded)
    pixels,          # [C, 2] pixel coords (u, v) in PIXELS
    corr_valid,      # [C] bool, valid entries first (score-sorted buffers)
    intrinsics,      # [3, 3]
    distance_tolerance=8.0,
    num_hypotheses=4096,
    refine_iters=2,
):
    c = points3d.shape[0]
    n_valid = jnp.maximum(corr_valid.sum(), 1)

    # normalized camera coords for DLT conditioning
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    norm_pix = jnp.stack([(pixels[:, 0] - cx) / fx, (pixels[:, 1] - cy) / fy], axis=1)

    u = jax.random.uniform(rng, (num_hypotheses, 6))
    idx = jnp.clip((u * n_valid).astype(jnp.int32), 0, c - 1)

    def hyp(i6):
        p = _dlt_projection(points3d[i6], norm_pix[i6], jnp.ones(6))
        return _pose_from_projection(p)

    r_h, t_h = jax.vmap(hyp)(idx)                             # [H, 3, 3], [H, 3, 1]

    def count(rt):
        r, t = rt
        inl = _reproject_inliers(r, t, points3d, pixels, intrinsics,
                                 corr_valid, distance_tolerance)
        return inl.sum()

    counts = jax.vmap(count)((r_h, t_h))
    best = jnp.argmax(counts)
    r, t = r_h[best], t_h[best]
    best_inl = _reproject_inliers(r, t, points3d, pixels, intrinsics,
                                  corr_valid, distance_tolerance)

    for _ in range(refine_iters):
        w = best_inl.astype(jnp.float32)
        p = _dlt_projection(points3d, norm_pix, w)
        r_new, t_new = _pose_from_projection(p)
        inl_new = _reproject_inliers(r_new, t_new, points3d, pixels, intrinsics,
                                     corr_valid, distance_tolerance)
        improve = inl_new.sum() >= best_inl.sum()
        r = jnp.where(improve, r_new, r)
        t = jnp.where(improve, t_new, t)
        best_inl = jnp.where(improve, inl_new, best_inl)

    finite = jnp.all(jnp.isfinite(r)) & jnp.all(jnp.isfinite(t))
    return PnPResult(r, t, best_inl.sum(), (best_inl.sum() >= 4) & finite)
