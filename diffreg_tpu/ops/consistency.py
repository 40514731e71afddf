"""Correspondence spatial-consistency ops (vision3d/ops/spatial_consistency.py,
eigenvector.py) — the SC²/PointDSC-style outlier-rejection primitives.

TPU notes: the leading-eigenvector power iteration runs a fixed
``lax.fori_loop`` (the reference's torch.allclose early-exit is a host sync
per step; at M<=a few k the extra matvecs are cheaper than one sync).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vision import pairwise_distance


def spatial_consistency(src_corr_points, tgt_corr_points, sigma: float):
    """SC_{ij} = relu(1 - d_ij^2 / sigma^2), d = | |p_i-p_j| - |q_i-q_j| |
    (spatial_consistency.py:7-25). [*, N, 3] x2 -> [*, N, N]."""
    sd = pairwise_distance(src_corr_points, src_corr_points, squared=False)
    td = pairwise_distance(tgt_corr_points, tgt_corr_points, squared=False)
    delta = jnp.abs(sd - td)
    return jax.nn.relu(1.0 - delta ** 2 / sigma ** 2)


def cross_spatial_consistency(q_src, q_tgt, s_src, s_tgt, sigma: float):
    """Consistency between two correspondence sets
    (spatial_consistency.py:28-54): [*, N, M]."""
    sd = pairwise_distance(q_src, s_src, squared=False)
    td = pairwise_distance(q_tgt, s_tgt, squared=False)
    delta = jnp.abs(sd - td)
    return jax.nn.relu(1.0 - delta ** 2 / sigma ** 2)


def leading_eigenvector(mat, num_iterations: int = 10):
    """Leading eigenvector by power iteration (eigenvector.py:6-37).

    mat: [*, M, M] (symmetric non-negative, e.g. a consistency matrix).
    Returns [*, M]."""
    v0 = jnp.ones_like(mat[..., :1])

    def body(_, v):
        v = mat @ v
        return v / jnp.clip(jnp.linalg.norm(v, axis=-2, keepdims=True), 1e-12, None)

    v = jax.lax.fori_loop(0, num_iterations, body, v0)
    return v[..., 0]
