"""Pri3D ResNet / ResUNet image backbones (vision3d/models/pri3d/).

Flax twins of resnet.py (BasicBlock/Bottleneck/ResNet + create_resnet*) and
resunet.py (Encoder taps, _UpProjection, Decoder/DecoderMultiRes,
Res{10,18,50}UNet). Channel-last NHWC; torch BatchNorm2d becomes GroupNorm
(inference-twin normalization — the library models here are feature
extractors, and the repo convention for converted torch backbones is
GroupNorm unless a checkpoint requires running stats, cf. nn/encoders.py).
Bilinear upsampling is align_corners=True via ops.vision.resize_align_corners
exactly like the reference F.interpolate calls (resunet.py:57).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers2d3d import optimal_groups
from ..ops.vision import resize_align_corners


def _norm(x, name):
    return nn.GroupNorm(num_groups=optimal_groups(x.shape[-1]), epsilon=1e-5,
                        name=name)(x)


class BasicBlock(nn.Module):
    """resnet.py:17-48."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv1")(x)
        out = _norm(out, "bn1")
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = _norm(out, "bn2")
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = _norm(residual, "downsample_bn")
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """resnet.py:51-88 (expansion 4)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_norm(out, "bn1"))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(_norm(out, "bn2"))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = _norm(out, "bn3")
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = _norm(residual, "downsample_bn")
        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    """ResNet stem + 4 stages, returning the per-stage taps the ResUNet
    decoder consumes (resnet.py:90-133 + resunet.py Encoder:6-39)."""
    layers: Sequence[int]                 # blocks per stage
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x):
        block = Bottleneck if self.bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_norm(x, "bn1"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        taps = []
        for stage, (planes, nblocks) in enumerate(zip((64, 128, 256, 512),
                                                      self.layers)):
            for i in range(nblocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(planes, stride, name=f"layer{stage + 1}_{i}")(x)
            taps.append(x)
        return tuple(taps)


def create_resnet10():
    return ResNetEncoder((1, 1, 1, 1))


def create_resnet18():
    return ResNetEncoder((2, 2, 2, 2))


def create_resnet34():
    return ResNetEncoder((3, 4, 6, 3))


def create_resnet50():
    return ResNetEncoder((3, 4, 6, 3), bottleneck=True)


def create_resnet101():
    return ResNetEncoder((3, 4, 23, 3), bottleneck=True)


class UpProjection(nn.Module):
    """resunet.py:42-66: bilinear(align_corners) resize + two conv branches."""
    out_features: int

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        x = resize_align_corners(x, size)
        b1 = nn.Conv(self.out_features, (5, 5), padding=2, use_bias=False,
                     name="conv1")(x)
        b1 = nn.relu(_norm(b1, "bn1"))
        b1 = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False,
                     name="conv1_2")(b1)
        b1 = _norm(b1, "bn1_2")
        b2 = nn.Conv(self.out_features, (5, 5), padding=2, use_bias=False,
                     name="conv2")(x)
        b2 = _norm(b2, "bn2")
        return nn.relu(b1 + b2)


class ResUNetDecoder(nn.Module):
    """resunet.py:69-105: 4 up-projections with skip additions + 1x1 head."""
    block_channel: Sequence[int]
    output_channel: int = 1

    @nn.compact
    def __call__(self, taps):
        x1, x2, x3, x4 = taps
        nf = self.block_channel[-1]
        d = UpProjection(nf // 2, name="up1")(x4, x3.shape[1:3]) + x3
        d = UpProjection(nf // 4, name="up2")(d, x2.shape[1:3]) + x2
        d = UpProjection(nf // 8, name="up3")(d, x1.shape[1:3]) + x1
        d = UpProjection(nf // 16, name="up4")(
            d, (x1.shape[1] * 2, x1.shape[2] * 2))
        return nn.Conv(self.output_channel, (1, 1), name="conv0")(d)


class ResUNetDecoderMultiRes(nn.Module):
    """resunet.py:108-146: emits 1/2- and 1/4-resolution heads."""
    block_channel: Sequence[int]
    output_channel: int = 1

    @nn.compact
    def __call__(self, taps):
        x1, x2, x3, x4 = taps
        nf = self.block_channel[-1]
        d = UpProjection(nf // 2, name="up1")(x4, x3.shape[1:3]) + x3
        d = UpProjection(nf // 4, name="up2")(d, x2.shape[1:3]) + x2
        d3 = UpProjection(nf // 8, name="up3")(d, x1.shape[1:3])
        out3 = nn.Conv(self.output_channel, (1, 1), name="conv1")(d3)
        d4 = UpProjection(nf // 16, name="up4")(
            d3 + x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        out4 = nn.Conv(self.output_channel, (1, 1), name="conv2")(d4)
        return out4, out3


class ResUNet(nn.Module):
    """Res{10,18,50}UNet (resunet.py:149-262) behind one depth knob."""
    output_channel: int
    depth: int = 18                      # 10 | 18 | 50
    multires: bool = False

    @nn.compact
    def __call__(self, x):
        if self.depth == 50:
            layers, bottleneck = (3, 4, 6, 3), True
            channels = (256, 512, 1024, 2048)
        elif self.depth == 10:
            layers, bottleneck = (1, 1, 1, 1), False
            channels = (64, 128, 256, 512)
        else:
            layers, bottleneck = (2, 2, 2, 2), False
            channels = (64, 128, 256, 512)
        taps = ResNetEncoder(layers, bottleneck, name="encoder")(x)
        dec_cls = ResUNetDecoderMultiRes if self.multires else ResUNetDecoder
        return dec_cls(channels, self.output_channel, name="decoder")(taps)
