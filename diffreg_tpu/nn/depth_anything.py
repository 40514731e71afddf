"""DepthAnything monocular depth head (DPT over DINOv2), Flax.

Exact architectural twin of the reference tower (Diff-Reg-2d3d/
depth_anything/dpt.py:22-165 + blocks.py:60-150) so the released
``LiheYoung/depth_anything_vitl14`` weights convert 1:1
(tools/convert_towers.py):

  * taps = the LAST 4 ViT blocks via get_intermediate_layers(x, 4), each
    with the final LayerNorm applied (dpt.py:152, torchhub dinov2
    get_intermediate_layers norm=True);
  * reassemble: per-tap 1x1 projection then learned resize — ConvTranspose
    x4, ConvTranspose x2, identity, stride-2 conv (dpt.py:39-59);
  * scratch layerN_rn: bias-free 3x3 convs to the fusion width;
  * refinenet1..4: residual conv units + bilinear align_corners=True
    upsample + 1x1 out_conv (blocks.py FeatureFusionBlock);
  * head: 3x3 -> upsample to 14x patch grid -> 3x3 -> ReLU -> 1x1 -> ReLU,
    final bilinear align_corners resize to the input resolution.

Used frozen; the 2D-3D pipeline lifts its depth to pseudo-3D patch centers
with a learnable affine rescale (model.py:273-275, 849-901 — the affine
lives in the pipeline, not here).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dinov2 import DinoV2Config, DinoVisionTransformer


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    n_taps: int = 4          # get_intermediate_layers(x, 4): LAST 4 blocks


from ..ops.vision import resize_align_corners  # shared align-corners resize


class ResidualConvUnit(nn.Module):
    """blocks.py ResidualConvUnit (bn=False): relu-conv-relu-conv + skip."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """blocks.py FeatureFusionBlock (deconv=False, bn=False, expand=False,
    align_corners=True)."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw: Optional[Tuple[int, int]] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_align_corners(x, out_hw)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], out_hw: Tuple[int, int]):
        """taps: 4 patch-token grids [B, h, w, D] (shallow->deep); out_hw is
        the final depth-map resolution."""
        c = self.cfg
        ph, pw = taps[0].shape[1], taps[0].shape[2]

        feats = []
        for i, (tap, oc) in enumerate(zip(taps, c.out_channels)):
            h = nn.Conv(oc, (1, 1), name=f"project{i}")(tap)
            if i == 0:      # ConvTranspose k4 s4 (dpt.py resize_layers[0])
                h = nn.ConvTranspose(oc, (4, 4), strides=(4, 4),
                                     name="resize0")(h)
            elif i == 1:    # ConvTranspose k2 s2
                h = nn.ConvTranspose(oc, (2, 2), strides=(2, 2),
                                     name="resize1")(h)
            elif i == 3:    # stride-2 3x3 conv, torch pad=1 (NOT lax SAME,
                            # whose asymmetric pad shifts the window centers)
                h = nn.Conv(oc, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize3")(h)
            h = nn.Conv(c.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"rn{i}")(h)
            feats.append(h)

        p4 = FeatureFusionBlock(c.features, name="fusion4")(
            feats[3], out_hw=feats[2].shape[1:3])
        p3 = FeatureFusionBlock(c.features, name="fusion3")(
            p4, feats[2], out_hw=feats[1].shape[1:3])
        p2 = FeatureFusionBlock(c.features, name="fusion2")(
            p3, feats[1], out_hw=feats[0].shape[1:3])
        p1 = FeatureFusionBlock(c.features, name="fusion1")(p2, feats[0])

        h = nn.Conv(c.features // 2, (3, 3), padding="SAME", name="head_conv1")(p1)
        h = resize_align_corners(h, (ph * 14, pw * 14))
        h = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        h = nn.relu(h)
        # final resize to the input resolution (dpt.py:159) + relu
        h = resize_align_corners(h, out_hw)
        return nn.relu(h)[..., 0]    # [B, H, W] non-negative disparity


class DepthAnything(nn.Module):
    """DINOv2 encoder + DPT head -> relative depth map."""
    vit: DinoV2Config
    dpt: DPTConfig

    @nn.compact
    def __call__(self, image):
        taps_at = tuple(range(self.vit.depth - self.dpt.n_taps, self.vit.depth))
        _, taps = DinoVisionTransformer(self.vit, name="encoder")(
            image, return_layers=taps_at, norm_taps=True)
        return DPTHead(self.dpt, name="head")(taps, image.shape[1:3])
