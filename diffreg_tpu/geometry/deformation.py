"""Embedded-deformation warping + Adam-based non-rigid ICP.

Twins of vision3d/ops/embedded_deformation.py and nonrigid_icp_adam.py,
restructured for XLA: the reference's ragged nonzero + scatter_add skinning
becomes a dense masked gather-and-sum over each point's K anchors (same
math — anchor index -1 contributes zero weight), and the Adam loop is an
``optax`` update inside one ``lax.fori_loop`` (the reference re-dispatches
500 separate torch steps, nonrigid_icp_adam.py:108-131).

Poses here are (rotations [M, 3, 3], translations [M, 3]) — the repo-wide
representation — where the reference packs [M, 4, 4] transforms.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def apply_embedded_deformation_dense(points, nodes, rotations, translations,
                                     weights, eps: float = 1e-6):
    """Dense-weight variant (embedded_deformation.py:7-29).

    points [N, 3], nodes [M, 3], rotations [M, 3, 3], translations [M, 3],
    weights [N, M] (unnormalized skinning weights).
    """
    w = weights / (weights.sum(axis=1, keepdims=True) + eps)       # [N, M]
    rel = points[None, :, :] - nodes[:, None, :]                   # [M, N, 3]
    warped = jnp.einsum("mij,mnj->mni", rotations, rel) \
        + nodes[:, None, :] + translations[:, None, :]             # [M, N, 3]
    return jnp.einsum("mn,mni->ni", w.T, warped)


def apply_embedded_deformation(points, nodes, rotations, translations,
                               anchor_indices, anchor_weights,
                               eps: float = 1e-6):
    """Anchor-list variant (embedded_deformation.py:32-66).

    anchor_indices [N, K] int (−1 = absent anchor), anchor_weights [N, K].
    """
    w = anchor_weights / (anchor_weights.sum(axis=1, keepdims=True) + eps)
    valid = anchor_indices >= 0
    idx = jnp.where(valid, anchor_indices, 0)
    anc_nodes = nodes[idx]                                         # [N, K, 3]
    anc_rot = rotations[idx]                                       # [N, K, 3, 3]
    anc_trn = translations[idx]                                    # [N, K, 3]
    rel = points[:, None, :] - anc_nodes
    warped = jnp.einsum("nkij,nkj->nki", anc_rot, rel) + anc_nodes + anc_trn
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(warped * w[..., None], axis=1)


def _icp_cost(rotations, translations, src_nodes, src_corr, tgt_corr,
              anchor_indices, anchor_weights, node_edges, node_edge_weights,
              corr_mask, edge_mask):
    # landmark term (nonrigid_icp_adam.py:9-19)
    warped = apply_embedded_deformation(src_corr, src_nodes, rotations,
                                        translations, anchor_indices,
                                        anchor_weights)
    res = jnp.sum((warped - tgt_corr) ** 2, axis=1)
    landmark = jnp.sum(jnp.where(corr_mask, res, 0.0)) / jnp.maximum(corr_mask.sum(), 1)

    # ARAP term (nonrigid_icp_adam.py:22-37)
    anc, nbr = node_edges[:, 0], node_edges[:, 1]
    disp = src_nodes[nbr] - src_nodes[anc]
    warped_nbr = jnp.einsum("eij,ej->ei", rotations[anc], disp) \
        + src_nodes[anc] + translations[anc]
    tgt_nbr = src_nodes[nbr] + translations[nbr]
    arap_vals = jnp.sum((warped_nbr - tgt_nbr) ** 2, axis=1) * node_edge_weights
    arap = jnp.sum(jnp.where(edge_mask, arap_vals, 0.0)) / jnp.maximum(edge_mask.sum(), 1)

    # soft-orthogonality on the free 3x3 rotations (nonrigid_icp_adam.py:40-53)
    gram = jnp.einsum("mji,mjk->mik", rotations, rotations)        # R^T R
    eye = jnp.eye(3, dtype=rotations.dtype)
    ortho = jnp.mean(jnp.sum((gram - eye) ** 2, axis=(1, 2)))

    return landmark + 0.1 * arap + 0.1 * ortho


def non_rigid_icp_adam(src_nodes, src_corr_points, tgt_corr_points,
                       anchor_indices, anchor_weights, node_edges,
                       node_edge_weights, num_iterations: int = 500,
                       lr: float = 1e-2, corr_mask=None, edge_mask=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Embedded-deformation non-rigid ICP with an Adam solver
    (nonrigid_icp_adam.py:79-131).

    Returns per-node (rotations [M, 3, 3], translations [M, 3]). Rotations
    are the same free 3x3 parameterization with the soft orthogonality
    penalty as the reference (weights 1.0 landmark / 0.1 arap / 0.1 ortho).
    """
    m = src_nodes.shape[0]
    if corr_mask is None:
        corr_mask = jnp.ones(src_corr_points.shape[0], bool)
    if edge_mask is None:
        edge_mask = jnp.ones(node_edges.shape[0], bool)
    params = {"r": jnp.tile(jnp.eye(3, dtype=src_nodes.dtype)[None], (m, 1, 1)),
              "t": jnp.zeros((m, 3), src_nodes.dtype)}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    loss_fn = lambda p: _icp_cost(
        p["r"], p["t"], src_nodes, src_corr_points, tgt_corr_points,
        anchor_indices, anchor_weights, node_edges, node_edge_weights,
        corr_mask, edge_mask)

    def body(_, carry):
        params, opt_state = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, _ = jax.lax.fori_loop(0, num_iterations, body, (params, opt_state))
    return params["r"], params["t"]
