"""Masked elementwise/statistics ops for padded, static-shape tensors.

The reference operates on ragged packed tensors (no padding); on TPU every
tensor is padded to a bucketed static shape and carries a validity mask, so
all statistics must be computed under the mask to be numerically identical
to the reference on the valid entries.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1.0e9  # finite stand-in for -inf: exp() underflows to 0, grads stay finite


def masked_mean(x, mask, axis, keepdims=False, eps=1e-12):
    """Mean of ``x`` over ``axis`` counting only entries where ``mask`` is True.

    ``mask`` broadcasts against ``x`` (trailing feature dims allowed on x).
    """
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, eps)


def masked_var(x, mask, axis, keepdims=False, eps=1e-12):
    mu = masked_mean(x, mask, axis, keepdims=True, eps=eps)
    return masked_mean((x - mu) ** 2, mask, axis=axis, keepdims=keepdims, eps=eps)


def masked_instance_norm(x, mask, eps=1e-5):
    """Per-channel normalization over the point axis, counting valid points only.

    Matches the reference ``BatchNormBlock`` (Diff-Reg-3dmatch/models/blocks.py:415-447),
    which despite its name applies ``nn.InstanceNorm1d`` over the *packed point
    axis* per channel, with no affine parameters. On padded tensors the same
    statistics are recovered by masking; padded rows are zeroed on output.

    Args:
      x:    [N, C] (or [B, N, C]) features.
      mask: [N] (or [B, N]) validity.
    """
    axis = x.ndim - 2
    mu = masked_mean(x, mask, axis=axis, keepdims=True)
    var = masked_mean((x - mu) ** 2, mask, axis=axis, keepdims=True)
    y = (x - mu) * (1.0 / jnp.sqrt(var + eps))
    return y * mask.astype(x.dtype)[..., None]


def mask_matrix(scores, src_mask, tgt_mask, fill=NEG_INF):
    """Fill entries of [B, N, M] scores where either side is padding."""
    valid = src_mask[..., :, None] & tgt_mask[..., None, :]
    return jnp.where(valid, scores, fill)
