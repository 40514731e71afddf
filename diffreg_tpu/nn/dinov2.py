"""DINOv2 vision transformer (Flax) — frozen feature tower for the 2D-3D branch.

Re-implements the DINOv2 ViT architecture the reference vendors
(Diff-Reg-2d3d/transformer/dinov2.py: DinoVisionTransformer / vit_large —
patch 14, prenorm blocks with LayerScale, GELU MLP, cls token + interpolated
position embeddings). Weights load from a released torch checkpoint via
``tools/convert_dinov2.py``; the tower is frozen (reference hides it from
DDP and never trains it, encoders.py:101).

The reference taps intermediate patch tokens (block 16 of 24 for ViT-L,
model.py:358) — ``__call__`` returns all block outputs' patch tokens.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    img_size: int = 518          # position-embedding native grid (37x37)


def vit_large_config() -> DinoV2Config:
    return DinoV2Config()


def vit_base_config() -> DinoV2Config:
    return DinoV2Config(embed_dim=768, depth=12, num_heads=12)


def vit_small_config() -> DinoV2Config:
    return DinoV2Config(embed_dim=384, depth=12, num_heads=6)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = nn.Dense(self.dim * 3, name="qkv")(x).reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(jnp.asarray(d, x.dtype))
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(o)


class Block(nn.Module):
    cfg: DinoV2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(c.embed_dim, c.num_heads, name="attn")(h)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        hidden = int(c.embed_dim * c.mlp_ratio)
        h = nn.Dense(hidden, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, name="mlp_fc2")(h)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(h)
        return x


class DinoVisionTransformer(nn.Module):
    cfg: DinoV2Config

    @nn.compact
    def __call__(self, image, return_layers: Tuple[int, ...] = (),
                 norm_taps: bool = False):
        """image: [B, H, W, C] with H, W multiples of patch_size.

        Returns (final_tokens [B, h*w, D], per-layer list of patch-token
        grids [B, h, w, D] for requested layers; empty tuple = all layers).
        ``norm_taps`` applies the final LayerNorm to each tap — torchhub
        dinov2 ``get_intermediate_layers(..., norm=True)`` semantics, used
        by the DepthAnything head (depth_anything/dpt.py:152).
        """
        c = self.cfg
        b, hh, ww, _ = image.shape
        ph, pw = hh // c.patch_size, ww // c.patch_size

        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), name="patch_embed")(image)
        x = x.reshape(b, ph * pw, c.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.embed_dim)), x], axis=1)

        grid = c.img_size // c.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, grid * grid + 1, c.embed_dim))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (grid, grid):
            pos_patch = pos_patch.reshape(1, grid, grid, c.embed_dim)
            pos_patch = jax.image.resize(pos_patch, (1, ph, pw, c.embed_dim), "bicubic")
            pos_patch = pos_patch.reshape(1, ph * pw, c.embed_dim)
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1)

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")

        taps: List[jnp.ndarray] = []
        want = set(return_layers) if return_layers else set(range(c.depth))
        for i in range(c.depth):
            x = Block(c, name=f"block{i}")(x)
            if i in want:
                t = final_norm(x) if norm_taps else x
                taps.append(t[:, 1:].reshape(b, ph, pw, c.embed_dim))

        x = final_norm(x)
        return x[:, 1:], taps
