"""Volumetric position encoding (sinusoidal / rotary over voxelized coords).

Functional re-implementation of the reference ``VolumetricPositionEncoding``
(Diff-Reg-3dmatch/models/position_encoding.py:5-87): coordinates are voxelized
against a volume origin, each axis gets feature_dim//6 sin/cos frequencies,
and the code is either additive (``sinusoidal``) or a rotary pair
(``rotary``) applied RoFormer-style.

The PE is a pure function of coordinates (the reference detaches it), so here
it is simply non-learnable math — ``jax.lax.stop_gradient`` is applied by
callers that feed it gradients through warped coordinates.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def embed_rotary(x, cos, sin):
    """Rotate feature pairs: x*cos + rot90(x)*sin, interleaved layout.

    x, cos, sin: [..., d] with cos/sin laid out [t0,t0,t1,t1,...].
    """
    x2 = jnp.stack([-x[..., 1::2], x[..., 0::2]], axis=-1).reshape(x.shape)
    return x * cos + x2 * sin


def embed_pos(pe_type, x, pe):
    """Combine features and position code."""
    if pe_type == "rotary":
        return embed_rotary(x, pe[..., 0], pe[..., 1])
    if pe_type == "sinusoidal":
        return x + pe
    raise KeyError(pe_type)


def volumetric_pe(xyz, feature_dim, vol_origin, voxel_size, pe_type):
    """Compute the volumetric position code.

    Args:
      xyz:       [B, N, 3] coordinates.
      feature_dim: model dim d (must be divisible by 6).
      vol_origin: length-3 origin of the volume.
      voxel_size: scalar voxel edge.
      pe_type:   'rotary' | 'sinusoidal'.

    Returns:
      rotary:     [B, N, d, 2] stacked (cos, sin).
      sinusoidal: [B, N, d].
    """
    b, n, _ = xyz.shape
    origin = jnp.asarray(vol_origin, xyz.dtype).reshape(1, 1, 3)
    vox = (xyz - origin) / voxel_size

    d3 = feature_dim // 3
    freq_idx = jnp.arange(0, d3, 2, dtype=xyz.dtype)  # [d/6]
    div = jnp.exp(freq_idx * (-math.log(10000.0) / d3)).reshape(1, 1, -1)

    phases = vox[..., :, None] * div[..., None, :]  # [B, N, 3, d/6]
    sin = jnp.sin(phases)
    cos = jnp.cos(phases)

    if pe_type == "sinusoidal":
        # per-axis [sin, cos] concatenated: [sinx, cosx, siny, cosy, sinz, cosz]
        parts = []
        for ax in range(3):
            parts.extend([sin[..., ax, :], cos[..., ax, :]])
        code = jnp.concatenate(parts, axis=-1)
    elif pe_type == "rotary":
        # duplicate each frequency: t -> [t, t], then concat axes
        def dup(a):  # [B, N, d/6] -> [B, N, d/3]
            return jnp.stack([a, a], axis=-1).reshape(b, n, -1)

        sin_pos = jnp.concatenate([dup(sin[..., ax, :]) for ax in range(3)], axis=-1)
        cos_pos = jnp.concatenate([dup(cos[..., ax, :]) for ax in range(3)], axis=-1)
        code = jnp.stack([cos_pos, sin_pos], axis=-1)  # [B, N, d, 2]
    else:
        raise KeyError(pe_type)

    return jax.lax.stop_gradient(code)
