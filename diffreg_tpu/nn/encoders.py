"""Frozen CNN feature pyramids for the 2D-3D branch (reference encoders.py).

``VGG19BN`` is the architectural twin of torchvision ``vgg19_bn().features
[:40]`` as the reference uses it (Diff-Reg-2d3d/experiments/.../encoders.py:
107-119, VGG19 class): conv-bn-relu stacks with the pre-maxpool activations
recorded at scales 1, 2, 4 and 8. BatchNorm runs in eval mode (frozen
running stats) — the tower is never trained (encoders.py train() only
toggles the CNN, and the reference freezes BN).

``CNNandDinov2`` composes the CNN pyramid with the frozen DINOv2 ViT whose
final patch tokens land in the scale-16 slot (encoders.py:103-119). The
reference model only consumes slot 16 (model.py:357) — the CNN pyramid is
computed-but-unused there; it exists here for checkpoint-layout parity and
for configs that do consume it.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .dinov2 import DinoV2Config, DinoVisionTransformer

# torchvision vgg19_bn features[:40]: conv counts per block before each
# maxpool — (2, 2, 4, 4) convs at widths (64, 128, 256, 512)
VGG19_PLAN: Tuple[Tuple[int, int], ...] = ((2, 64), (2, 128), (4, 256), (4, 512))


class VGG19BN(nn.Module):
    """VGG19-bn pyramid: {1: 64ch, 2: 128ch, 4: 256ch, 8: 512ch} feature
    maps, each recorded right before its maxpool (encoders.py:74-77)."""

    plan: Tuple[Tuple[int, int], ...] = VGG19_PLAN

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        x = image
        feats: Dict[int, jnp.ndarray] = {}
        scale = 1
        li = 0
        for n_convs, width in self.plan:
            for _ in range(n_convs):
                x = nn.Conv(width, (3, 3), padding="SAME", name=f"conv{li}")(x)
                x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{li}")(x)
                x = nn.relu(x)
                li += 1
            feats[scale] = x
            scale *= 2
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class CNNandDinov2(nn.Module):
    """CNN pyramid + frozen DINOv2 final patch tokens at slot 16.

    Returns {1, 2, 4, 8: VGG feats, 16: dino tokens [B, H/14, W/14, D]}.
    The DINO slot uses the ViT's x_norm_patchtokens (encoders.py:113-118).
    """
    vit: DinoV2Config

    @nn.compact
    def __call__(self, image_rgb: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        feats = VGG19BN(name="cnn")(image_rgb)
        b, h, w, _ = image_rgb.shape
        tokens, _ = DinoVisionTransformer(self.vit, name="dinov2")(image_rgb)
        d = self.vit.embed_dim
        feats[16] = tokens.reshape(b, h // self.vit.patch_size,
                                   w // self.vit.patch_size, d)
        return feats
