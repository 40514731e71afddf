"""DepthAnything monocular depth head (DPT over DINOv2), Flax.

Re-implements the DPT decoder the reference vendors (Diff-Reg-2d3d/
depth_anything/dpt.py:22-186 + blocks.py): reassemble four ViT taps to a
feature pyramid, residual fusion top-down, monocular depth head. Used
frozen; the 2D-3D pipeline lifts its depth to pseudo-3D patch centers with
a learnable affine rescale (model.py:273-275, 849-901 — the affine lives in
the pipeline, not here).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dinov2 import DinoV2Config, DinoVisionTransformer


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    tap_layers: Tuple[int, ...] = (4, 11, 17, 23)   # ViT-L taps


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = jax.image.resize(x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]),
                             "bilinear")
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], out_hw: Tuple[int, int]):
        """taps: 4 patch-token grids [B, h, w, D] (shallow->deep)."""
        c = self.cfg
        # reassemble: project + re-scale (x4, x2, x1, x0.5 relative to h, w)
        feats = []
        scales = (4, 2, 1, 0.5)
        for i, (tap, oc, s) in enumerate(zip(taps, c.out_channels, scales)):
            h = nn.Conv(oc, (1, 1), name=f"project{i}")(tap)
            b, hh, ww, _ = h.shape
            nh, nw = int(hh * s), int(ww * s)
            h = jax.image.resize(h, (b, nh, nw, oc), "bilinear")
            h = nn.Conv(c.features, (3, 3), padding="SAME", name=f"rn{i}")(h)
            feats.append(h)

        p4 = FeatureFusionBlock(c.features, name="fusion4")(
            feats[3], out_hw=feats[2].shape[1:3])
        p3 = FeatureFusionBlock(c.features, name="fusion3")(
            p4, feats[2], out_hw=feats[1].shape[1:3])
        p2 = FeatureFusionBlock(c.features, name="fusion2")(
            p3, feats[1], out_hw=feats[0].shape[1:3])
        p1 = FeatureFusionBlock(c.features, name="fusion1")(
            p2, feats[0], out_hw=(feats[0].shape[1] * 2, feats[0].shape[2] * 2))

        h = nn.Conv(c.features // 2, (3, 3), padding="SAME", name="head_conv1")(p1)
        h = jax.image.resize(h, (h.shape[0], out_hw[0], out_hw[1], h.shape[3]),
                             "bilinear")
        h = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        return nn.relu(h)[..., 0]    # [B, H, W] non-negative disparity


class DepthAnything(nn.Module):
    """DINOv2 encoder + DPT head -> relative depth map."""
    vit: DinoV2Config
    dpt: DPTConfig

    @nn.compact
    def __call__(self, image):
        _, taps = DinoVisionTransformer(self.vit, name="encoder")(
            image, return_layers=self.dpt.tap_layers)
        return DPTHead(self.dpt, name="head")(taps, image.shape[1:3])
