"""Fixed-K radius neighbors / kNN — device (chunked brute force) and host (KD-tree).

Replaces the reference nanoflann C++ batched radius query
(Diff-Reg-3dmatch/cpp_wrappers/cpp_neighbors) with the same *contract*:
each query row gets up to K neighbor indices within ``radius``, padded with
the sentinel index ``num_supports`` (exactly the shadow-point convention the
KPConv gather expects, blocks.py:253-257), and neighbors are sorted by
distance so that index 0 is the nearest (required by closest-pool upsampling,
blocks.py:56-68).

Device versions are O(Nq*Ns) brute force, tiled over queries to bound memory —
the coarse levels here are a few thousand points, where brute force on the MXU
beats any tree. Host version uses scipy cKDTree for the 30k-point raw clouds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def radius_neighbors(queries, q_valid, supports, s_valid, radius, k, chunk=2048):
    """Fixed-K radius search, sentinel-padded, distance-sorted.

    Args:
      queries:  [Nq, 3]; q_valid [Nq] bool.
      supports: [Ns, 3]; s_valid [Ns] bool.
      radius:   scalar search radius.
      k:        static max neighbors.
      chunk:    query tile size (memory/bandwidth knob).

    Returns:
      neighbors [Nq, k] int32 — indices into supports, == Ns where there is
      no neighbor (sentinel / shadow point).
    """
    nq = queries.shape[0]
    ns = supports.shape[0]
    pad_q = (-nq) % chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qv = jnp.pad(q_valid, (0, pad_q))
    q = q.reshape(-1, chunk, 3)
    qv = qv.reshape(-1, chunk)

    s_big = jnp.where(s_valid[:, None], supports, 1.0e6)  # invalid supports far away

    def tile(args):
        qt, qvt = args
        d2 = jnp.sum((qt[:, None, :] - s_big[None, :, :]) ** 2, axis=-1)  # [chunk, Ns]
        d2 = jnp.where(qvt[:, None], d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)  # nearest k, sorted ascending by distance
        within = (-neg) <= radius * radius
        return jnp.where(within, idx, ns).astype(jnp.int32)

    out = jax.lax.map(tile, (q, qv))
    return out.reshape(-1, k)[:nq]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(queries, q_valid, supports, s_valid, k, chunk=2048):
    """k nearest neighbors (no radius cutoff), sentinel Ns for invalid queries."""
    nq = queries.shape[0]
    ns = supports.shape[0]
    pad_q = (-nq) % chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qv = jnp.pad(q_valid, (0, pad_q))
    q = q.reshape(-1, chunk, 3)
    qv = qv.reshape(-1, chunk)
    s_big = jnp.where(s_valid[:, None], supports, 1.0e6)

    def tile(args):
        qt, qvt = args
        d2 = jnp.sum((qt[:, None, :] - s_big[None, :, :]) ** 2, axis=-1)
        neg, idx = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        idx = jnp.where(qvt[:, None], idx, ns)
        return idx.astype(jnp.int32), dist

    idx, dist = jax.lax.map(tile, (q, qv))
    return idx.reshape(-1, k)[:nq], dist.reshape(-1, k)[:nq]


def radius_neighbors_np(queries, supports, radius, k):
    """Host KD-tree radius search, same contract (sentinel = len(supports))."""
    from scipy.spatial import cKDTree

    tree = cKDTree(supports)
    dists, idx = tree.query(queries, k=k, distance_upper_bound=radius)
    if k == 1:
        dists = dists[:, None]
        idx = idx[:, None]
    # cKDTree pads missing results with index == len(supports) already.
    return idx.astype(np.int32)


def knn_np(queries, supports, k):
    from scipy.spatial import cKDTree

    tree = cKDTree(supports)
    dists, idx = tree.query(queries, k=k)
    if k == 1:
        dists = dists[:, None]
        idx = idx[:, None]
    return idx.astype(np.int32), dists
