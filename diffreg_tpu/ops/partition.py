"""Point-to-node partition + kNN interpolation + batched mutual top-k.

Re-implements vision3d partition/matching ops the 2D-3D branch uses
(vision3d/ops/point_cloud_partition.py:14-105, mutual_topk_select.py:63,
knn interpolation in the point backbone decoder) as static-shape kernels.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .masked import NEG_INF
from .vision import pairwise_distance


class Partition(NamedTuple):
    point_to_node: jnp.ndarray   # [N] int32 node index per point
    node_sizes: jnp.ndarray      # [M] int32
    node_masks: jnp.ndarray      # [M] bool (node has >= 1 point)
    node_knn_indices: jnp.ndarray  # [M, K] point indices (sentinel N)
    node_knn_masks: jnp.ndarray    # [M, K] bool


def point_to_node_partition(points, nodes, point_valid, node_valid, k):
    """Assign each point to its nearest node; gather each node's k nearest
    points that belong to it (vision3d point_cloud_partition.py:41-105).

    Args:
      points: [N, 3]; nodes: [M, 3]; valid masks; k static.
    """
    n = points.shape[0]
    d2 = pairwise_distance(points, nodes)                    # [N, M]
    d2 = jnp.where(node_valid[None, :], d2, jnp.inf)
    p2n = jnp.argmin(d2, axis=1).astype(jnp.int32)
    p2n = jnp.where(point_valid, p2n, -1)

    member = (p2n[None, :] == jnp.arange(nodes.shape[0])[:, None])  # [M, N]
    node_sizes = member.sum(axis=1).astype(jnp.int32)
    node_masks = (node_sizes > 0) & node_valid

    # k nearest member points per node
    nd2 = pairwise_distance(nodes, points)                   # [M, N]
    nd2 = jnp.where(member & point_valid[None, :], nd2, jnp.inf)
    neg, idx = jax.lax.top_k(-nd2, k)
    knn_masks = jnp.isfinite(-neg)
    knn_indices = jnp.where(knn_masks, idx, n).astype(jnp.int32)
    return Partition(p2n, node_sizes, node_masks, knn_indices, knn_masks)


def knn_interpolate(q_pts, s_pts, s_feats, q_valid, s_valid, k=3, eps=1e-10):
    """Inverse-distance weighted kNN feature interpolation (decoder upsample
    of the 2d3d point backbone, point_backbone.py knn-interpolate).

    Uses the exact chunked kNN (difference-based distances): the
    a^2-2ab+b^2 form loses ~1e-3 at zero distance, which matters because a
    query coincident with a support must reproduce its feature exactly.
    """
    from .neighbors import knn as exact_knn

    idx, d = exact_knn(q_pts, q_valid, s_pts, s_valid, k)
    ns = s_pts.shape[0]
    safe_idx = jnp.minimum(idx, ns - 1)
    w = 1.0 / jnp.clip(d, eps, None)
    w = jnp.where(idx < ns, w, 0.0)
    w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), eps, None)
    feats = s_feats[safe_idx]                                # [Nq, k, C]
    out = jnp.sum(feats * w[..., None], axis=1)
    return out * q_valid[:, None]


def knn_interpolate_from_table(q_pts, s_pts, s_feats, table, eps=1e-8):
    """Inverse-SQUARED-distance interpolation over a precomputed neighbor
    table (vision3d knn_interpolate_pack_mode, knn_interpolate.py:44-79):
    weights = mask / (d^2 + eps), normalized with +eps — the reference
    decoder consumes the pyramid's upsampling tables this way, using ALL
    table entries, not a fixed k.

    table: [Nq, K] int32 with sentinel >= len(s_pts) for missing entries.
    """
    ns = s_pts.shape[0]
    safe = jnp.minimum(table, ns - 1)
    knn_pts = s_pts[safe]                               # [Nq, K, 3]
    knn_feats = s_feats[safe]                           # [Nq, K, C]
    d2 = jnp.sum((q_pts[:, None, :] - knn_pts) ** 2, axis=-1)
    mask = (table < ns).astype(s_feats.dtype)
    w = mask / (d2 + eps)
    w = w / (jnp.sum(w, axis=1, keepdims=True) + eps)
    return jnp.sum(knn_feats * w[..., None], axis=1)


def batch_mutual_topk_select(score_mat, k, valid_row=None, valid_col=None,
                             threshold=None, largest=True, mutual=True):
    """Batched mutual top-k: [B, N, M] -> bool corr mask [B, N, M]
    (vision3d mutual_topk_select.py:63-120 semantics, mask output)."""
    s = score_mat if largest else -score_mat
    if valid_row is not None:
        s = jnp.where(valid_row[..., :, None], s, NEG_INF)
    if valid_col is not None:
        s = jnp.where(valid_col[..., None, :], s, NEG_INF)

    row_kth = jax.lax.top_k(s, k)[0][..., :, -1:]
    col_kth = jnp.swapaxes(jax.lax.top_k(jnp.swapaxes(s, -1, -2), k)[0][..., :, -1:], -1, -2)
    row_in = s >= row_kth
    col_in = s >= col_kth
    corr = (row_in & col_in) if mutual else (row_in | col_in)
    if threshold is not None:
        gate = (score_mat > threshold) if largest else (score_mat < threshold)
        corr = corr & gate
    if valid_row is not None:
        corr = corr & valid_row[..., :, None]
    if valid_col is not None:
        corr = corr & valid_col[..., None, :]
    return corr


def index_select(data, indices, axis=0):
    """jnp.take wrapper matching vision3d index_select semantics."""
    return jnp.take(data, indices, axis=axis)
