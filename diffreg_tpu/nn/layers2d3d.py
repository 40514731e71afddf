"""Shared layers for the 2D-3D branch: Fourier embedding + vision3d-style
transformer layer (post-norm MHA + FFN).

Re-implements vision3d/layers/embedding.py:53-100 (FourierEmbedding) and
vision3d/layers/transformer.py (MultiHeadAttention / AttentionLayer /
AttentionOutput / TransformerLayer) in Flax with mask semantics preserved
(k_masks True == ignored in the reference; here ``k_valid`` True == keep,
inverted at the call site for clarity).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import NEG_INF
from ..utils.precision import get_precision


def fourier_embedding(x, length: int, k0: float = 0.0, use_pi: bool = False,
                      use_input: bool = True):
    """Emb(x) = [x?, sin(2^k x), cos(2^k x), ...] matching the reference
    layout: per frequency, [sin(all dims), cos(all dims)] concatenated.

    x: [..., N] -> [..., (2L+1)N] (use_input) or [..., 2LN].
    """
    shape = x.shape
    n = shape[-1]
    flat = x.reshape(-1, 1, n)
    factors = (2.0 ** (k0 + np.arange(length, dtype=np.float32))).reshape(1, -1, 1)
    if use_pi:
        factors = factors * np.pi
    thetas = flat * factors                                   # [B, L, N]
    emb = jnp.concatenate([jnp.sin(thetas), jnp.cos(thetas)], axis=-1)  # [B, L, 2N]
    emb = emb.reshape(shape[:-1] + (2 * length * n,))
    if use_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return jax.lax.stop_gradient(emb) if False else emb


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_tokens, k_tokens, v_tokens, k_valid=None):
        h = self.num_heads
        dim = self.d_model // h
        q = nn.Dense(self.d_model, name="q_token_layer")(q_tokens)
        k = nn.Dense(self.d_model, name="k_token_layer")(k_tokens)
        v = nn.Dense(self.d_model, name="v_token_layer")(v_tokens)
        b, nq, _ = q.shape
        q = q.reshape(b, -1, h, dim)
        k = k.reshape(b, -1, h, dim)
        v = v.reshape(b, -1, h, dim)
        a = jnp.einsum("bnhc,bmhc->bhnm", q, k, precision=get_precision())
        a = a / jnp.sqrt(jnp.asarray(dim, a.dtype))
        if k_valid is not None:
            a = jnp.where(k_valid[:, None, None, :], a, NEG_INF)
        a = jax.nn.softmax(a, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", a, v, precision=get_precision())
        return out.reshape(b, nq, self.d_model)


class TransformerLayer(nn.Module):
    """AttentionLayer + AttentionOutput (post-norm residuals)."""
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_tokens, k_tokens, v_tokens, k_valid=None):
        hidden = MultiHeadAttention(self.d_model, self.num_heads, name="attention")(
            q_tokens, k_tokens, v_tokens, k_valid)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        tokens = nn.LayerNorm(name="norm1")(hidden + q_tokens)

        ffn = nn.Dense(self.d_model * 2, name="expand")(tokens)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, name="squeeze")(ffn)
        return nn.LayerNorm(name="norm2")(tokens + ffn)


class ConvBlock(nn.Module):
    """Conv2d + GroupNorm + LeakyReLU (vision3d ConvBlock defaults)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_norm: bool = True
    use_act: bool = True
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding="SAME")(x)
        if self.use_norm:
            g = min(self.groups, self.out_channels)
            x = nn.GroupNorm(num_groups=g)(x)
        if self.use_act:
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x
