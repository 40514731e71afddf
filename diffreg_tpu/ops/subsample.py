"""Voxel-grid barycenter subsampling — device (jit, static shapes) and host (numpy).

Replaces the reference C++ grid subsampling
(Diff-Reg-3dmatch/cpp_wrappers/cpp_subsampling, ~860 LoC, host-only) with:
  * ``grid_subsample``      — jittable, static-output-size version built on
    jnp.unique(size=...) + segment_sum, runs on TPU/CPU inside the compiled
    pipeline (same algorithm as the GPU hash path the reference keeps in
    vision3d/ops/grid_subsample.py but never uses on the live Lepard path);
  * ``grid_subsample_np``   — exact numpy twin for the host data pipeline.

Both return voxel barycenters; output ordering is by voxel key (deterministic),
which downstream ops never depend on. Padded input points must be passed with
``valid`` masks; padded outputs carry ``valid`` masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_out",))
def grid_subsample(points, valid, voxel_size, max_out):
    """Barycenter voxel subsampling with static output size.

    Args:
      points:  [N, 3] padded point cloud.
      valid:   [N] bool mask of real points.
      voxel_size: scalar voxel edge length.
      max_out: static output capacity (use N for exactness).

    Returns:
      (sub_points [max_out, 3], sub_valid [max_out] bool, num_valid int32)
    """
    n = points.shape[0]
    origin = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    # Padding points get a sentinel voxel far outside any real voxel.
    sentinel = jnp.int32(2**30)
    coords = jnp.where(valid[:, None], coords, sentinel)

    # Unique voxel keys with inverse map. Key = lexicographic (x, y, z) via
    # unique over rows; jnp.unique(size=...) is jit-compatible.
    uniq, inv = jnp.unique(
        coords, axis=0, size=max_out + 1, return_inverse=True,
        fill_value=sentinel,
    )
    inv = inv.reshape(-1)

    ones = valid.astype(points.dtype)
    counts = jax.ops.segment_sum(ones, inv, num_segments=max_out + 1)
    sums = jax.ops.segment_sum(points * ones[:, None], inv, num_segments=max_out + 1)
    bary = sums / jnp.maximum(counts[:, None], 1.0)
    sub_valid = (counts > 0) & jnp.any(uniq != sentinel, axis=1)

    # Drop the sentinel bucket (always sorted last because key is maximal)
    # and compact: sentinel bucket can only be the final slot(s).
    bary = bary[:max_out]
    sub_valid = sub_valid[:max_out]
    return bary, sub_valid, jnp.sum(sub_valid.astype(jnp.int32))


def grid_subsample_np(points: np.ndarray, voxel_size: float):
    """Numpy barycenter voxel subsampling (host data pipeline).

    Same contract as the C++ ``grid_subsampling`` (barycenter per occupied
    voxel); output ordered by voxel key.
    """
    origin = points.min(axis=0)
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    # Ravel with per-axis extents to a single int64 key.
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    counts = np.bincount(inv, minlength=len(uniq)).astype(points.dtype)
    out = np.zeros((len(uniq), 3), dtype=points.dtype)
    for d in range(3):
        out[:, d] = np.bincount(inv, weights=points[:, d], minlength=len(uniq))
    return out / counts[:, None]


def grid_subsample_with_features_np(points, features, voxel_size):
    """Numpy subsampling that also averages features per voxel."""
    origin = points.min(axis=0)
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    counts = np.bincount(inv, minlength=len(uniq)).astype(points.dtype)
    pts = np.zeros((len(uniq), 3), dtype=points.dtype)
    for d in range(3):
        pts[:, d] = np.bincount(inv, weights=points[:, d], minlength=len(uniq))
    feats = np.zeros((len(uniq), features.shape[1]), dtype=features.dtype)
    for d in range(features.shape[1]):
        feats[:, d] = np.bincount(inv, weights=features[:, d], minlength=len(uniq))
    return pts / counts[:, None], feats / counts[:, None]
