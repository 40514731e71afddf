"""Log-space Sinkhorn optimal transport with a learned dustbin.

Re-implements the semantics of the reference ``log_optimal_transport``
(Diff-Reg-3dmatch/models/matching.py:61-93): an (N+1)x(M+1) augmented score
matrix with a single learnable dustbin score ``alpha``, marginals that give
each real row/col mass 1/(ms+ns) and the dustbins mass ns/(ms+ns) resp.
ms/(ms+ns), and ``iters`` alternating log-domain normalizations.

TPU-first details:
  * fixed iteration count unrolled inside jit (3 in all reference configs);
  * masking uses a large finite negative (see ops.masked.NEG_INF) so that
    gradients never see NaN — exp() underflows to exactly 0;
  * everything is batched [B, N, M] and shape-static, so XLA fuses the whole
    loop into a handful of HBM-resident logsumexp kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .masked import NEG_INF, mask_matrix


def log_sinkhorn(scores, alpha, iters, src_mask=None, tgt_mask=None,
                 src_pad=None, tgt_pad=None):
    """Run masked log-space Sinkhorn with dustbins.

    Args:
      scores:   [B, N, M] similarity matrix (padding entries are overwritten).
      alpha:    scalar dustbin score (learnable).
      iters:    python int, number of Sinkhorn iterations (unrolled).
      src_mask: [B, N] bool or None — VALIDITY: invalid rows get -inf scores
                and are excluded from the ms/ns counts.
      tgt_mask: [B, M] bool or None.
      src_pad:  [B, N] bool or None — REAL rows (static-shape padding mask).
                The reference only masks `scores` (2d3d matching.py:123-125):
                a real-but-invalid row keeps its 1/(ms+ns) marginal mass and a
                finite dustbin score, so ALL its mass drains into the dustbin
                and shifts every real confidence. Rows outside `src_pad`
                (padding the reference never sees) are excluded entirely.
                Defaults to src_mask (the safe behavior when mask==padding).
      tgt_pad:  [B, M] bool or None.

    Returns:
      [B, N+1, M+1] log assignment matrix Z with ``Z - log(ms+ns)`` removed
      exactly as the reference does, so ``exp(Z)[:, :-1, :-1]`` are the match
      confidences.
    """
    b, n, m = scores.shape
    dtype = scores.dtype
    if src_pad is None:
        src_pad = src_mask
    if tgt_pad is None:
        tgt_pad = tgt_mask

    if src_mask is None:
        ms = jnp.full((b, 1), float(n), dtype)
        ns = jnp.full((b, 1), float(m), dtype)
    else:
        scores = mask_matrix(scores, src_mask, tgt_mask)
        ms = src_mask.sum(axis=1, keepdims=True).astype(dtype)  # [B, 1]
        ns = tgt_mask.sum(axis=1, keepdims=True).astype(dtype)
        # guard the degenerate fully-masked side: log(0) would cascade infs
        # through the marginals; outputs on such pairs are masked downstream
        ms = jnp.maximum(ms, 1.0)
        ns = jnp.maximum(ns, 1.0)

    alpha = jnp.asarray(alpha, dtype)
    bins0 = jnp.broadcast_to(alpha, (b, n, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, m))
    corner = jnp.broadcast_to(alpha, (b, 1, 1))
    if src_mask is not None:
        # PADDED rows/cols must not see a finite dustbin score either, or the
        # dustbin row/col becomes a finite escape hatch for their (zeroed)
        # marginal mass during the iterations. Real-but-invalid rows keep the
        # finite dustbin (reference behavior, see src_pad docstring).
        bins0 = jnp.where(src_pad[:, :, None], bins0, NEG_INF)
        bins1 = jnp.where(tgt_pad[:, None, :], bins1, NEG_INF)

    z = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=2),
            jnp.concatenate([bins1, corner], axis=2),
        ],
        axis=1,
    )  # [B, N+1, M+1]

    norm = -jnp.log(ms + ns)  # [B, 1]
    # Marginals cover REAL rows/cols only. The reference repeats `norm` over
    # its full (unpadded at eval B=1) sizes (matching.py:81-82) — including
    # real-but-invalid rows, whose mass all flows to the dustbin; with our
    # static bucket padding, giving PADDED rows/cols real marginal mass would
    # drain the dustbin budget through the always-finite bins rows and skew
    # every real confidence (~2x at 50% padding). NEG_INF (finite) keeps the
    # log-domain iterations NaN-free while zeroing their mass exactly.
    log_mu = jnp.concatenate([jnp.broadcast_to(norm, (b, n)), jnp.log(ns) + norm], axis=1)
    log_nu = jnp.concatenate([jnp.broadcast_to(norm, (b, m)), jnp.log(ms) + norm], axis=1)
    if src_mask is not None:
        pad_r = jnp.concatenate([src_pad, jnp.ones((b, 1), bool)], axis=1)
        pad_c = jnp.concatenate([tgt_pad, jnp.ones((b, 1), bool)], axis=1)
        log_mu = jnp.where(pad_r, log_mu, NEG_INF)
        log_nu = jnp.where(pad_c, log_nu, NEG_INF)

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    for _ in range(int(iters)):
        u = log_mu - jax.nn.logsumexp(z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(z + u[:, :, None], axis=1)

    z = z + u[:, :, None] + v[:, None, :]
    return z - norm[:, :, None]


def sinkhorn_conf_matrix(scores, alpha, iters, src_mask=None, tgt_mask=None):
    """Convenience wrapper: [B, N, M] match confidences (dustbins dropped)."""
    z = log_sinkhorn(scores, alpha, iters, src_mask, tgt_mask)
    return jnp.exp(z)[:, :-1, :-1]


def dual_softmax_conf_matrix(sim, temperature, src_mask=None, tgt_mask=None):
    """Dual-softmax matcher (reference matching.py:193-203)."""
    sim = sim / temperature
    if src_mask is not None:
        s1 = jnp.where(src_mask[:, :, None], sim, NEG_INF)
        s2 = jnp.where(tgt_mask[:, None, :], sim, NEG_INF)
    else:
        s1 = s2 = sim
    return jax.nn.softmax(s1, axis=1) * jax.nn.softmax(s2, axis=2)
