"""Image backbone: ResNet-basic-block UNet with DINO feature injection.

Re-implements the 2D-3D experiment's ImageBackbone (Diff-Reg-2d3d/
experiments/.../image_backbone.py:69-289): encoder 1/2 -> 1/8 with GroupNorm
/LeakyReLU basic blocks, decoder that injects (bilinear-resized) DINOv2
features at the 1/8 level and returns [1/1 fine, 1/2, 1/4, 1/8 coarse]
feature maps. NHWC layout (TPU-native), jax.image.resize for interpolation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.vision import resize_align_corners
from .layers2d3d import ConvBlock, leaky2d3d


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = ConvBlock(self.out_channels, 3, self.stride, name="conv1")(x)
        residual = ConvBlock(self.out_channels, 3, 1, use_act=False,
                             name="conv2")(residual)
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            identity = x
        else:
            identity = ConvBlock(self.out_channels, 3, self.stride,
                                 use_act=False, name="identity")(x)
        return leaky2d3d(identity + residual)


def _resize_to(x, ref_hw):
    # reference decoder interpolations are align_corners=True
    # (image_backbone.py:193-213) — half-pixel bilinear would shift every
    # upsampled map by a sub-pixel amount
    return resize_align_corners(x, tuple(ref_hw))


class ImageBackbone(nn.Module):
    """Returns [fine 1/1 out_channels, 1/2, 1/4, 1/8 coarse 4*base]."""
    out_channels: int = 128
    base_channels: int = 128

    @nn.compact
    def __call__(self, image, dino_feat: Optional[jnp.ndarray] = None):
        """image: [B, H, W, C]; dino_feat: [B, h, w, 4*base] or None.

        Submodule names mirror the reference state_dict
        (image_backbone.py:81-184) for direct weight conversion."""
        c = self.base_channels
        s1 = ConvBlock(c, 7, 2, name="encoder1")(image)               # 1/2
        s2 = BasicBlock(c, name="encoder2_0")(s1)
        s2 = BasicBlock(c, name="encoder2_1")(s2)                     # 1/2
        s3 = BasicBlock(c * 2, stride=2, name="encoder3_0")(s2)       # 1/4
        s3 = BasicBlock(c * 2, name="encoder3_1")(s3)
        s4 = BasicBlock(c * 4, stride=2, name="encoder4_0")(s3)       # 1/8
        s4 = BasicBlock(c * 4, name="encoder4_1")(s4)

        if dino_feat is not None:
            s4 = s4 + _resize_to(dino_feat, s4.shape[1:3])

        latent4 = ConvBlock(c * 4, 1, use_norm=False, use_act=False,
                            name="decoder4_1")(s4)                    # 1/8

        up3 = _resize_to(latent4, s3.shape[1:3])
        latent3 = ConvBlock(c * 4, 1, use_norm=False, use_act=False,
                            name="decoder3_1")(s3)
        latent3 = ConvBlock(c * 4, 3, name="decoder3_2_0")(latent3 + up3)
        latent3 = ConvBlock(c * 2, 3, use_norm=False, use_act=False,
                            name="decoder3_2_1")(latent3)             # 1/4

        up2 = _resize_to(latent3, s2.shape[1:3])
        latent2 = ConvBlock(c * 2, 1, use_norm=False, use_act=False,
                            name="decoder2_1")(s2)
        latent2 = ConvBlock(c * 2, 3, name="decoder2_2_0")(latent2 + up2)
        latent2 = ConvBlock(c, 3, use_norm=False, use_act=False,
                            name="decoder2_2_1")(latent2)             # 1/2

        latent1 = ConvBlock(c, 1, use_norm=False, use_act=False,
                            name="decoder1_1")(s1) + latent2
        latent1 = _resize_to(latent1, image.shape[1:3])
        latent1 = ConvBlock(c, 3, name="decoder1_2_0")(latent1)
        latent1 = ConvBlock(c, 3, use_norm=False, use_act=False,
                            name="decoder1_2_1")(latent1)
        fine = ConvBlock(self.out_channels, 1, use_norm=False, use_act=False,
                         name="out_proj")(latent1)                    # 1/1

        return [fine, latent2, latent3, latent4]
