"""Frozen-tower runner: precompute DINOv2 tokens + DepthAnything depth.

The reference runs its frozen towers inside MATR2D3D.forward every step
(model.py:342-358). TPU-native design: the towers are pure functions of the
image, so they run ONCE per sample — jitted on device, outside the training
graph — and their outputs ride the batch (``Batch2D3D.dino_feats`` /
``mono_depth``). Measured on-chip (tools/bench_towers.py,
snapshot/chip-r5a/bench_towers.json, v5e bf16 @476x630): DINOv2 ViT-L/14
23.2 ms/image + DepthAnything 32.1 ms/image — running them in-loop would
cost 26% of the combined 2D-3D step time (6.39 -> 4.72 pairs/s at
steps=10), and at the reference's steps=50 eval config a proportionally
larger share. Precompute removes all of it from the train/eval loop and
keeps the trainable pipeline tower-agnostic.

Weights come from tools/convert_towers.py (orbax checkpoints of the
released torch towers). Preprocessing parity:

  * DINOv2 eats the raw RGB image (reference feeds the [0,1] tensor without
    ImageNet normalization, model.py:354-357) at a multiple-of-14 crop;
  * DepthAnything eats the ImageNet-normalized image resized so both sides
    are multiples of 14 with the lower-bound rule (model.py:176-190).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _multiple_of_14_lower_bound(h: int, w: int, target_h: int, target_w: int):
    """Resize rule of the reference DepthAnything transform (model.py:
    176-190): scale so both sides are >= target (lower_bound), then round
    each side to a multiple of 14."""
    scale = max(target_h / h, target_w / w)
    nh = int(np.ceil(h * scale / 14) * 14)
    nw = int(np.ceil(w * scale / 14) * 14)
    return nh, nw


@dataclasses.dataclass
class TowerRunner:
    """Holds jitted tower applies + their frozen variables."""

    dino_variables: Optional[dict] = None       # {'params': ...} for DinoVisionTransformer
    da_variables: Optional[dict] = None         # {'params': {'encoder','head'}} for DepthAnything
    dino_cfg: Optional[object] = None            # DinoV2Config
    da_vit_cfg: Optional[object] = None
    da_dpt_cfg: Optional[object] = None

    def __post_init__(self):
        import jax

        self._dino_fn = None
        self._da_fn = None
        if self.dino_variables is not None:
            from ..nn.dinov2 import DinoVisionTransformer, vit_large_config

            cfg = self.dino_cfg or vit_large_config()
            dino_model = DinoVisionTransformer(cfg)
            self._patch = cfg.patch_size

            def dino_fn(image, _m=dino_model):
                tokens, _ = _m.apply(self.dino_variables, image)
                b, h, w, _ = image.shape
                return tokens.reshape(b, h // self._patch, w // self._patch, -1)

            self._dino_fn = jax.jit(dino_fn)
        if self.da_variables is not None:
            from ..nn.depth_anything import DepthAnything, DPTConfig
            from ..nn.dinov2 import vit_large_config

            da_model = DepthAnything(self.da_vit_cfg or vit_large_config(),
                                     self.da_dpt_cfg or DPTConfig())
            self._da_fn = jax.jit(
                lambda img, _m=da_model: _m.apply(self.da_variables, img))

    # ------------------------------------------------------------------ #

    def dino_tokens(self, image_rgb: np.ndarray) -> Optional[np.ndarray]:
        """image_rgb [B, H, W, 3] in [0, 1], H and W multiples of 14 ->
        final patch tokens [B, H/14, W/14, D] (x_norm_patchtokens)."""
        if self._dino_fn is None:
            return None
        return np.asarray(self._dino_fn(image_rgb))

    def mono_depth(self, image_rgb: np.ndarray,
                   target_hw: Tuple[int, int] = (476, 630)) -> Optional[np.ndarray]:
        """image_rgb [B, H, W, 3] in [0, 1] -> raw DepthAnything output
        [B, H, W] (resized back to the input resolution)."""
        if self._da_fn is None:
            return None
        import jax
        import jax.numpy as jnp

        b, h, w, _ = image_rgb.shape
        nh, nw = _multiple_of_14_lower_bound(h, w, *target_hw)
        x = (image_rgb - IMAGENET_MEAN) / IMAGENET_STD
        x = jax.image.resize(jnp.asarray(x), (b, nh, nw, 3), "bicubic")
        d = self._da_fn(x)                          # [B, nh, nw]
        d = jax.image.resize(d, (b, h, w), "bilinear")
        return np.asarray(d)


def load_tower_runner(dino_ckpt: Optional[str] = None,
                      da_ckpt: Optional[str] = None, **cfg_kwargs) -> TowerRunner:
    """Restore converted tower checkpoints (tools/convert_towers.py output)."""
    import orbax.checkpoint as ocp

    def restore(path):
        if not path:
            return None
        import os

        return ocp.StandardCheckpointer().restore(os.path.abspath(path))

    return TowerRunner(dino_variables=restore(dino_ckpt),
                       da_variables=restore(da_ckpt), **cfg_kwargs)
