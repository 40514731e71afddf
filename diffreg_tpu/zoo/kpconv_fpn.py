"""Generic KPConv-FPN backbone (vision3d/models/backbone/kpconv_fpn.py:8-116).

Arbitrary encoder/decoder stage counts over a batched graph pyramid, built
from the same vision3d-semantics blocks as the 2D-3D PointBackbone
(nn/point_backbone.py): encoder stage 1 = KPConvBlock + KPResidualBlock,
stages 2..E = strided + 2 residuals with doubled radius/width, decoder =
nearest/IDW interpolation + skip concat + unary (last decoder layer a plain
Dense when ``norm_act_last`` is False, kpconv_fpn.py:83-87).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.kpfcn import KPFCNConfig
from ..nn.point_backbone import UnaryBlock2D3D, _KPBlock, _KPResidual
from ..ops.partition import knn_interpolate_from_table


@dataclasses.dataclass(frozen=True)
class KPConvFPNConfig:
    input_dim: int = 1
    output_dim: int = 256
    first_dim: int = 64
    kernel_size: int = 15
    voxel_size: float = 0.025
    kpconv_radius: float = 2.5
    kpconv_sigma: float = 2.0
    encoder_stages: int = 4
    decoder_stages: int = 2
    norm_act_last: bool = False


class KPConvFPN(nn.Module):
    """Returns decoder feature list coarsest-first reversed to finest-first,
    exactly like the reference (kpconv_fpn.py:89-116)."""
    cfg: KPConvFPNConfig

    @nn.compact
    def __call__(self, pyr):
        c = self.cfg
        assert c.encoder_stages >= 2 and 1 <= c.decoder_stages <= c.encoder_stages
        kcfg = KPFCNConfig(architecture=(), num_kernel_points=c.kernel_size)
        pts, masks = pyr["points"], pyr["masks"]
        neigh, pools, ups = pyr["neighbors"], pyr["pools"], pyr["upsamples"]
        r = c.voxel_size * c.kpconv_radius
        s = c.voxel_size * c.kpconv_sigma

        feats = _KPBlock(c.input_dim, c.first_dim, r, s, kcfg, name="encoder1_1")(
            pts[0], pts[0], pyr["features"], neigh[0], masks[0])
        feats = _KPResidual(c.first_dim, c.first_dim * 2, r, s, kcfg,
                            name="encoder1_2")(
            pts[0], pts[0], feats, neigh[0], masks[0], masks[0])
        enc = [feats]
        dim = c.first_dim * 2
        for i in range(1, c.encoder_stages):
            feats = _KPResidual(dim, dim, r, s, kcfg, strided=True,
                                name=f"encoder{i + 1}_1")(
                pts[i], pts[i - 1], feats, pools[i - 1], masks[i], masks[i - 1])
            feats = _KPResidual(dim, dim * 2, r * 2, s * 2, kcfg,
                                name=f"encoder{i + 1}_2")(
                pts[i], pts[i], feats, neigh[i], masks[i], masks[i])
            feats = _KPResidual(dim * 2, dim * 2, r * 2, s * 2, kcfg,
                                name=f"encoder{i + 1}_3")(
                pts[i], pts[i], feats, neigh[i], masks[i], masks[i])
            enc.append(feats)
            dim, r, s = dim * 2, r * 2, s * 2

        # decoder: one level per stage, coarsest first, reversed at the end
        # (kpconv_fpn.py:100-116)
        interp = jax.vmap(knn_interpolate_from_table, in_axes=(0, 0, 0, 0))
        dec = [feats]
        e = c.encoder_stages
        for i in range(e - 1, e - c.decoder_stages, -1):
            feats = interp(pts[i - 1], pts[i], feats, ups[i - 1])
            feats = jnp.concatenate([feats, enc[i - 1]], axis=-1)
            last = (not c.norm_act_last) and i == e - c.decoder_stages + 1
            if last:
                feats = nn.Dense(c.output_dim, name=f"decoder{i}")(feats)
            else:
                feats = UnaryBlock2D3D(dim // 2, name=f"decoder{i}")(
                    feats, masks[i - 1])
            dim //= 2
            dec.append(feats)
        return dec[::-1]
