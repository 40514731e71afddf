"""Cross-modal fusion transformer (image tokens <-> point tokens).

Re-implements CrossModalFusionModule (Diff-Reg-2d3d/experiments/.../
fusion_module.py:10-107): linear projections of image features (optionally
concatenated with DINO features) and point features into a shared hidden
dim, Fourier positional embeddings (2D normalized pixels / centered 3D
points), then interleaved self/cross TransformerLayers.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers2d3d import TransformerLayer, fourier_embedding


class CrossModalFusionModule(nn.Module):
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Tuple[str, ...] = ("self", "cross") * 3
    use_embedding: bool = True
    embedding_dim: int = 10
    use_dino: bool = True

    @nn.compact
    def __call__(self, img_feats, img_pixels, pcd_feats, pcd_points,
                 img_feats_dino=None, img_valid=None, pcd_valid=None):
        """img_feats [B, HW, Ci]; img_pixels [B, HW, 2] (normalized);
        pcd_feats [B, N, Cp]; pcd_points [B, N, 3]."""
        img_tokens = nn.Dense(self.hidden_dim, name="img_in_proj")(img_feats)
        if self.use_dino:
            assert img_feats_dino is not None
            dino_tokens = nn.Dense(self.hidden_dim, name="img_in_proj_dino")(img_feats_dino)
            img_tokens = nn.relu(jnp.concatenate([img_tokens, dino_tokens], axis=-1))
            img_tokens = nn.Dense(self.hidden_dim, name="img_in_proj_all")(img_tokens)
        pcd_tokens = nn.Dense(self.hidden_dim, name="pcd_in_proj")(pcd_feats)

        if self.use_embedding:
            emb2d = fourier_embedding(img_pixels, self.embedding_dim)
            img_tokens = img_tokens + nn.Dense(self.hidden_dim, name="img_emb_proj")(emb2d)
            # centroid over REAL nodes only: the reference centers with a
            # plain mean (fusion_module.py:57) but sees no padding at B=1;
            # our padded rows must not shift the centroid
            if pcd_valid is not None:
                cnt = jnp.maximum(pcd_valid.sum(axis=1, keepdims=True), 1)
                mean = jnp.sum(pcd_points * pcd_valid[..., None], axis=1,
                               keepdims=True) / cnt[..., None]
            else:
                mean = jnp.mean(pcd_points, axis=1, keepdims=True)
            centered = pcd_points - mean
            emb3d = fourier_embedding(centered, self.embedding_dim)
            pcd_tokens = pcd_tokens + nn.Dense(self.hidden_dim, name="pcd_emb_proj")(emb3d)

        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(self.hidden_dim, self.num_heads, name=f"transformer{i}")
            if block == "self":
                img_tokens = layer(img_tokens, img_tokens, img_tokens, img_valid)
                pcd_tokens = layer(pcd_tokens, pcd_tokens, pcd_tokens, pcd_valid)
            else:
                img_tokens = layer(img_tokens, pcd_tokens, pcd_tokens, pcd_valid)
                pcd_tokens = layer(pcd_tokens, img_tokens, img_tokens, img_valid)

        out = nn.Dense(self.output_dim, name="out_proj")
        return out(img_tokens), out(pcd_tokens)
