"""Geometric feature ops: vector angles, point-pair features, local
reference frames, PCA normal estimation.

Twins of vision3d/ops/{vector_angle,point_pair_feature,
local_reference_frame,normal_estimation}.py in channel-last layout
([B, N, 3] / [N, 3] instead of the reference's [B, 3, N]). Normal
estimation runs the 3x3 covariance eigendecomposition batched on device
(the reference round-trips through torch.symeig on host CPU,
normal_estimation.py:37-39).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .vision import pairwise_distance


def rad2deg(rad):
    return rad * (180.0 / math.pi)


def deg2rad(deg):
    return deg * (math.pi / 180.0)


def vector_angle(x, y, use_degree: bool = False):
    """Angle between 3D vectors over the LAST axis (vector_angle.py:18-33)."""
    cross = jnp.linalg.norm(jnp.cross(x, y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    ang = jnp.arctan2(cross, dot)
    return rad2deg(ang) if use_degree else ang


def _group(x, idx):
    """[B, M, C] gathered by [B, N, K] -> [B, N, K, C]."""
    return jax.vmap(lambda f, i: f[i])(x, idx)


def local_ppf(q_points, s_points, q_normals, s_normals, neighbor_indices,
              use_absolute_position: bool = False,
              use_relative_position: bool = False,
              use_degree: bool = False):
    """Local point-pair features [<na,d>, <nr,d>, <na,nr>, ||d||]
    (point_pair_feature.py:9-62). Channel-last: inputs [B, N, 3], neighbor
    indices [B, N, K] into s_points; output [B, N, K, 4/7/10]."""
    nbr_p = _group(s_points, neighbor_indices)
    nbr_n = _group(s_normals, neighbor_indices)
    anc_p = jnp.broadcast_to(q_points[:, :, None, :], nbr_p.shape)
    anc_n = jnp.broadcast_to(q_normals[:, :, None, :], nbr_n.shape)
    d = nbr_p - anc_p
    feats = jnp.stack([
        vector_angle(anc_n, d, use_degree),
        vector_angle(nbr_n, d, use_degree),
        vector_angle(anc_n, nbr_n, use_degree),
        jnp.linalg.norm(d, axis=-1),
    ], axis=-1)
    if use_relative_position:
        feats = jnp.concatenate([d, feats], axis=-1)
    if use_absolute_position:
        feats = jnp.concatenate([anc_p, feats], axis=-1)
    return feats


def global_ppf(points, normals, use_degree: bool = False):
    """All-pairs PPF (point_pair_feature.py:65-84): [B, N, N, 4]."""
    d = points[:, None, :, :] - points[:, :, None, :]
    anc_n = jnp.broadcast_to(normals[:, :, None, :], d.shape)
    ref_n = jnp.broadcast_to(normals[:, None, :, :], d.shape)
    return jnp.stack([
        vector_angle(anc_n, d, use_degree),
        vector_angle(ref_n, d, use_degree),
        vector_angle(anc_n, ref_n, use_degree),
        jnp.linalg.norm(d, axis=-1),
    ], axis=-1)


def build_local_reference_frame(points, normals, num_neighbors: int,
                                return_axes: bool = False):
    """LRF per point ("The Perfect Match" smoothed-density frames,
    local_reference_frame.py:8-51): z = normal; x = weighted in-plane
    direction (weights |z-coord|/dist); y = x × z. Returns knn coordinates
    in the LRF [B, N, K, 3] (+ axes [B, N, 3] x3 when return_axes)."""
    d2 = pairwise_distance(points, points, squared=True)
    _, idx = jax.lax.top_k(-d2, num_neighbors)
    knn_points = _group(points, idx)                      # [B, N, K, 3]

    origins = points[:, :, None, :]
    z = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True),
                           1e-12, None)
    z_ax = z[:, :, None, :]                               # [B, N, 1, 3]

    off = knn_points - origins
    dist = jnp.linalg.norm(off, axis=-1, keepdims=True)
    z_coord = jnp.sum(off * z_ax, axis=-1, keepdims=True)
    plane_off = off - z_coord * z_ax
    w = jnp.abs(z_coord) / (dist + 1e-10)
    w = w / jnp.clip(jnp.sum(w, axis=2, keepdims=True), 1e-12, None)
    x = jnp.sum(plane_off * w, axis=2)
    x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
    y = jnp.cross(x, z)

    lrf = jnp.stack([
        jnp.sum(off * x[:, :, None, :], axis=-1),
        jnp.sum(off * y[:, :, None, :], axis=-1),
        z_coord[..., 0],
    ], axis=-1)
    if return_axes:
        return x, y, z, lrf
    return lrf


def estimate_normals(q_points, s_points: Optional[jnp.ndarray] = None,
                     k: int = 50, disambiguate_directions: bool = True):
    """PCA normals from k nearest support points (normal_estimation.py:10-47;
    pytorch3d heritage). Unbatched [N, 3] like the reference; vmap for
    batches. The 3x3 eigh runs fully on device."""
    if s_points is None:
        s_points = q_points
    d2 = pairwise_distance(q_points, s_points, squared=True)
    _, idx = jax.lax.top_k(-d2, k)
    knn = s_points[idx]                                   # [N, K, 3]
    cen = knn.mean(axis=1, keepdims=True)
    off = knn - cen
    cov = jnp.einsum("nki,nkj->nij", off, off) / k
    _, vecs = jnp.linalg.eigh(cov)                        # ascending
    normals = vecs[:, :, 0]
    if disambiguate_directions:
        off_q = knn - q_points[:, None, :]
        proj = jnp.sum(normals[:, None, :] * off_q, axis=2)
        flips = (jnp.sum(proj, axis=-1, keepdims=True) > 0).astype(normals.dtype)
        normals = (1.0 - 2.0 * flips) * normals
    return normals


def safe_divide(a, b, eps: float = 1e-6):
    """numeric.py:8-10."""
    return a / jnp.clip(b, eps, None)


def safe_sqrt(a, eps: float = 1e-6):
    """numeric.py:13-15."""
    return jnp.sqrt(jnp.clip(a, eps, None))
