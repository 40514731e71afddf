"""Point backbone for the 2D-3D branch: 3-stage KPConv encoder + kNN decoder.

Re-implements the 2d3d experiment PointBackbone (Diff-Reg-2d3d/experiments/
.../point_backbone.py:8-95): KPConv/KPResidual encoder over 3 pyramid
levels (stage 4 disabled in the reference too), decoder via inverse-distance
kNN interpolation + unary blocks; returns [fine s1, s2, coarse s3] features.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.partition import knn_interpolate_from_table
from .kpfcn import KPConvLayer, KPFCNConfig, NormBlock, UnaryBlock, _leaky


@dataclasses.dataclass(frozen=True)
class PointBackboneConfig:
    input_dim: int = 1
    output_dim: int = 128
    init_dim: int = 64
    kernel_size: int = 15
    init_radius: float = 0.0625    # 2.5 * 0.025 voxel
    init_sigma: float = 0.05


class _KPBlock(nn.Module):
    """KPConv + norm + leaky (vision3d KPConvBlock)."""
    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    kcfg: KPFCNConfig

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, inds, q_mask):
        h = KPConvLayer(self.in_dim, self.out_dim, self.radius, self.sigma, self.kcfg)(
            q_pts, s_pts, inds, feats)
        h = NormBlock(self.out_dim, True)(h, q_mask)
        return _leaky(h)


class _KPResidual(nn.Module):
    """vision3d KPResidualBlock: unary -> KPConv -> unary + shortcut."""
    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    kcfg: KPFCNConfig
    strided: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, inds, q_mask, s_mask):
        mid = self.out_dim // 4
        h = feats
        if self.in_dim != mid:
            h = UnaryBlock(mid, True)(h, s_mask)
        h = KPConvLayer(mid, mid, self.radius, self.sigma, self.kcfg)(q_pts, s_pts, inds, h)
        h = NormBlock(mid, True)(h, q_mask)
        h = _leaky(h)
        h = UnaryBlock(self.out_dim, True, no_relu=True)(h, q_mask)
        if self.strided:
            from ..ops.kpconv import max_pool

            shortcut = jax.vmap(max_pool)(feats, inds)
        else:
            shortcut = feats
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, True, no_relu=True)(shortcut, q_mask)
        return _leaky(h + shortcut)


class PointBackbone(nn.Module):
    cfg: PointBackboneConfig

    @nn.compact
    def __call__(self, pyr):
        """pyr: dict with points/masks/neighbors/pools/upsamples/features
        (batched, 3+ levels). Returns [s1 out_dim, s2 4d, s3 8d] features."""
        c = self.cfg
        d = c.init_dim
        kcfg = KPFCNConfig(architecture=(), num_kernel_points=c.kernel_size)
        pts, masks = pyr["points"], pyr["masks"]
        neigh, pools = pyr["neighbors"], pyr["pools"]
        r, s = c.init_radius, c.init_sigma

        f1 = _KPBlock(c.input_dim, d, r, s, kcfg)(pts[0], pts[0], pyr["features"], neigh[0], masks[0])
        f1 = _KPResidual(d, d * 2, r, s, kcfg)(pts[0], pts[0], f1, neigh[0], masks[0], masks[0])

        f2 = _KPResidual(d * 2, d * 2, r, s, kcfg, strided=True)(pts[1], pts[0], f1, pools[0], masks[1], masks[0])
        f2 = _KPResidual(d * 2, d * 4, 2 * r, 2 * s, kcfg)(pts[1], pts[1], f2, neigh[1], masks[1], masks[1])
        f2 = _KPResidual(d * 4, d * 4, 2 * r, 2 * s, kcfg)(pts[1], pts[1], f2, neigh[1], masks[1], masks[1])

        f3 = _KPResidual(d * 4, d * 4, 2 * r, 2 * s, kcfg, strided=True)(pts[2], pts[1], f2, pools[1], masks[2], masks[1])
        f3 = _KPResidual(d * 4, d * 8, 4 * r, 4 * s, kcfg)(pts[2], pts[2], f3, neigh[2], masks[2], masks[2])
        f3 = _KPResidual(d * 8, d * 8, 4 * r, 4 * s, kcfg)(pts[2], pts[2], f3, neigh[2], masks[2], masks[2])

        # decoder interpolation uses the pyramid's UPSAMPLING tables with
        # inverse-squared-distance weights over all entries (vision3d
        # knn_interpolate_pack_mode) — not a fixed-k nearest-neighbor search
        ups = pyr["upsamples"]
        interp = jax.vmap(knn_interpolate_from_table, in_axes=(0, 0, 0, 0))
        l2 = interp(pts[1], pts[2], f3, ups[1])
        l2 = jnp.concatenate([l2, f2], axis=-1)
        l2 = UnaryBlock(d * 4, True)(l2, masks[1])

        l1 = interp(pts[0], pts[1], l2, ups[0])
        l1 = jnp.concatenate([l1, f1], axis=-1)
        l1 = UnaryBlock(d * 2, True)(l1, masks[0])
        l1 = nn.Dense(c.output_dim, name="out_proj")(l1)

        return [l1, l2, f3]
