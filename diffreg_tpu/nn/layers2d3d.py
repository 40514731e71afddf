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


def leaky2d3d(x):
    """vision3d's default LeakyReLU (negative_slope 0.2,
    basic_layers/builder.py:121-126) — NOT the Lepard 0.1 slope used by the
    3DMatch KPFCN."""
    return nn.leaky_relu(x, negative_slope=0.2)


def optimal_groups(num_channels: int) -> int:
    """vision3d's GroupNorm group heuristic (basic_layers/builder.py:73-86):
    at most 32 groups, at least 8 channels per group, divisibility required."""
    g = 32
    while g > 1:
        if num_channels % g == 0 and num_channels // g >= 8:
            return g
        g //= 2
    # reference dims (64..512) always resolve; tiny test configs fall back
    # to a single group
    return 1


class GroupNormPack(nn.Module):
    """Masked affine GroupNorm over packed points (vision3d
    GroupNormPackMode, basic_layers/norm.py:53-66): input viewed as
    (1, C, N), so statistics pool the group's channels AND all (valid)
    points together. Padded rows are excluded from the statistics and
    zeroed on output."""
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        """x: [B, N, C]; mask: [B, N] bool."""
        g = optimal_groups(self.dim)
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        b, n, c = x.shape
        xg = x.reshape(b, n, g, c // g)
        m = mask[:, :, None, None].astype(x.dtype)
        cnt = jnp.maximum(mask.sum(axis=1), 1).astype(x.dtype)  # [B]
        denom = (cnt * (c // g))[:, None]                        # [B, 1]
        mu = jnp.sum(xg * m, axis=(1, 3)) / denom                # [B, g]
        var = jnp.sum(((xg - mu[:, None, :, None]) ** 2) * m, axis=(1, 3)) / denom
        y = (xg - mu[:, None, :, None]) / jnp.sqrt(var[:, None, :, None] + self.eps)
        y = y.reshape(b, n, c) * scale + bias
        return y * mask[:, :, None]


class MultiHeadAttention(nn.Module):
    """vision3d MultiHeadAttention (transformer.py:12-159).

    Optional relative-position attention: ``qk_embeds`` [B, N, M, C] is added
    to the keys per query pair (projected when ``qk_embed_proj``); the pair
    logit ``q·(k + qk)`` is computed as ``q·k + q·qk`` — same math, no
    [B,H,N,M,C] materialization of k+qk (transformer.py:120-126).
    ``k_weights`` [B, M] / ``qk_weights`` [B, N, M] scale logits pre-softmax;
    ``qk_valid`` [B, N, M] masks individual pairs (reference k_masks/qk_masks
    are True-if-IGNORED; here all masks are True-if-valid, repo convention).
    """
    d_model: int
    num_heads: int
    qk_embed_proj: bool = False

    @nn.compact
    def __call__(self, q_tokens, k_tokens, v_tokens, k_valid=None,
                 qk_embeds=None, k_weights=None, qk_weights=None, qk_valid=None):
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
        if qk_embeds is not None:
            if self.qk_embed_proj:
                qk_embeds = nn.Dense(self.d_model, name="qk_embed_layer")(qk_embeds)
            qk = qk_embeds.reshape(*qk_embeds.shape[:3], h, dim)
            a = a + jnp.einsum("bnhc,bnmhc->bhnm", q, qk, precision=get_precision())
        a = a / jnp.sqrt(jnp.asarray(dim, a.dtype))
        if qk_weights is not None:
            a = a * qk_weights[:, None, :, :]
        if k_weights is not None:
            a = a * k_weights[:, None, None, :]
        if k_valid is not None:
            a = jnp.where(k_valid[:, None, None, :], a, NEG_INF)
        if qk_valid is not None:
            a = jnp.where(qk_valid[:, None, :, :], a, NEG_INF)
        a = jax.nn.softmax(a, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", a, v, precision=get_precision())
        return out.reshape(b, nq, self.d_model)


class TransformerLayer(nn.Module):
    """AttentionLayer + AttentionOutput (post-norm residuals)."""
    d_model: int
    num_heads: int
    qk_embed_proj: bool = False

    @nn.compact
    def __call__(self, q_tokens, k_tokens, v_tokens, k_valid=None,
                 qk_embeds=None, k_weights=None, qk_weights=None, qk_valid=None):
        hidden = MultiHeadAttention(self.d_model, self.num_heads,
                                    qk_embed_proj=self.qk_embed_proj,
                                    name="attention")(
            q_tokens, k_tokens, v_tokens, k_valid, qk_embeds=qk_embeds,
            k_weights=k_weights, qk_weights=qk_weights, qk_valid=qk_valid)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        # torch LayerNorm eps (1e-5); flax defaults to 1e-6
        tokens = nn.LayerNorm(name="norm1", epsilon=1e-5)(hidden + q_tokens)

        ffn = nn.Dense(self.d_model * 2, name="expand")(tokens)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, name="squeeze")(ffn)
        return nn.LayerNorm(name="norm2", epsilon=1e-5)(tokens + ffn)


class ConvBlock(nn.Module):
    """Conv2d + GroupNorm + LeakyReLU (vision3d ConvBlock).

    Reference fidelity: the conv ALWAYS has a bias with GroupNorm (vision3d
    only drops it for BatchNorm, conv_block.py:79-84); GroupNorm groups
    follow the optimal-groups heuristic; eps is torch's 1e-5."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        # torch-style symmetric padding k//2: XLA "SAME" pads asymmetrically
        # for strided convs, which shifts border values vs the reference
        p = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=True)(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=optimal_groups(self.out_channels),
                             epsilon=1e-5)(x)
        if self.use_act:
            x = leaky2d3d(x)
        return x
