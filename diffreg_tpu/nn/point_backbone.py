"""Point backbone for the 2D-3D branch: 3-stage KPConv encoder + kNN decoder.

Re-implements the 2d3d experiment PointBackbone (Diff-Reg-2d3d/experiments/
.../point_backbone.py:8-95) on vision3d-layer semantics — which differ from
the Lepard-lineage KPFCN in three ways that matter for weight conversion and
value parity:

  * the KPConv itself carries a BIAS (vision3d KPConvBlock passes
    bias=True for GroupNorm configs, kpconv.py:194-199);
  * normalization is AFFINE GroupNorm over the packed point axis
    (GroupNormPackMode) with the optimal-groups heuristic — not the
    Lepard InstanceNorm;
  * unary blocks are Linear WITH bias + GroupNorm + LeakyReLU
    (UnaryBlockPackMode).

Decoder: inverse-squared-distance interpolation over the pyramid's
upsampling tables (vision3d knn_interpolate_pack_mode). Module names mirror
the reference state_dict (encoder1_1 .. encoder3_3, decoder2, decoder1,
out_proj) so the checkpoint converter is a direct rename.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.partition import knn_interpolate_from_table
from .kpfcn import KPConvLayer, KPFCNConfig
from .layers2d3d import GroupNormPack, leaky2d3d as _leaky


@dataclasses.dataclass(frozen=True)
class PointBackboneConfig:
    input_dim: int = 1
    output_dim: int = 128
    init_dim: int = 64
    kernel_size: int = 15
    init_radius: float = 0.0625    # 2.5 * 0.025 voxel
    init_sigma: float = 0.05


class UnaryBlock2D3D(nn.Module):
    """vision3d UnaryBlockPackMode: Linear(+bias) -> GroupNorm -> LeakyReLU."""
    out_dim: int
    use_act: bool = True

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Dense(self.out_dim, use_bias=True, name="mlp")(x)
        h = GroupNormPack(self.out_dim, name="norm")(h, mask)
        return _leaky(h) if self.use_act else h


class _KPConvBias(nn.Module):
    """vision3d KPConv == influence-weighted conv + bias (kpconv.py:96-152)."""
    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    kcfg: KPFCNConfig

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, inds):
        h = KPConvLayer(self.in_dim, self.out_dim, self.radius, self.sigma,
                        self.kcfg, name="kpconv")(q_pts, s_pts, inds, feats)
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return h + bias


class _KPBlock(nn.Module):
    """vision3d KPConvBlock: KPConv(+bias) + GroupNorm + LeakyReLU."""
    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    kcfg: KPFCNConfig

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, inds, q_mask):
        h = _KPConvBias(self.in_dim, self.out_dim, self.radius, self.sigma,
                        self.kcfg, name="conv")(q_pts, s_pts, feats, inds)
        h = GroupNormPack(self.out_dim, name="norm")(h, q_mask)
        return _leaky(h)


class _KPResidual(nn.Module):
    """vision3d KPResidualBlock (kpconv.py:210-282): unary1 -> KPConvBlock ->
    unary2(no act) + (maxpool-)shortcut -> LeakyReLU."""
    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    kcfg: KPFCNConfig
    strided: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, feats, inds, q_mask, s_mask):
        mid = self.out_dim // 4
        h = UnaryBlock2D3D(mid, name="unary1")(feats, s_mask)
        h = _KPBlock(mid, mid, self.radius, self.sigma, self.kcfg,
                     name="conv")(q_pts, s_pts, h, inds, q_mask)
        h = UnaryBlock2D3D(self.out_dim, use_act=False, name="unary2")(h, q_mask)
        if self.strided:
            from ..ops.kpconv import max_pool

            shortcut = jax.vmap(max_pool)(feats, inds)
        else:
            shortcut = feats
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock2D3D(self.out_dim, use_act=False,
                                      name="unary_shortcut")(shortcut, q_mask)
        return _leaky(h + shortcut)


class PointBackbone(nn.Module):
    cfg: PointBackboneConfig

    @nn.compact
    def __call__(self, pyr, return_all: bool = False):
        """pyr: dict with points/masks/neighbors/pools/upsamples/features
        (batched, 3+ levels). Returns [s1 out_dim, s2 4d, s3 8d] features;
        ``return_all`` additionally returns every encoder stage (parity
        debugging)."""
        trace = {}
        c = self.cfg
        d = c.init_dim
        kcfg = KPFCNConfig(architecture=(), num_kernel_points=c.kernel_size)
        pts, masks = pyr["points"], pyr["masks"]
        neigh, pools = pyr["neighbors"], pyr["pools"]
        r, s = c.init_radius, c.init_sigma

        f1 = _KPBlock(c.input_dim, d, r, s, kcfg, name="encoder1_1")(
            pts[0], pts[0], pyr["features"], neigh[0], masks[0])
        trace["s1a"] = f1
        f1 = _KPResidual(d, d * 2, r, s, kcfg, name="encoder1_2")(
            pts[0], pts[0], f1, neigh[0], masks[0], masks[0])
        trace["s1"] = f1

        f2 = _KPResidual(d * 2, d * 2, r, s, kcfg, strided=True, name="encoder2_1")(
            pts[1], pts[0], f1, pools[0], masks[1], masks[0])
        trace["s2a"] = f2
        f2 = _KPResidual(d * 2, d * 4, 2 * r, 2 * s, kcfg, name="encoder2_2")(
            pts[1], pts[1], f2, neigh[1], masks[1], masks[1])
        f2 = _KPResidual(d * 4, d * 4, 2 * r, 2 * s, kcfg, name="encoder2_3")(
            pts[1], pts[1], f2, neigh[1], masks[1], masks[1])

        f3 = _KPResidual(d * 4, d * 4, 2 * r, 2 * s, kcfg, strided=True, name="encoder3_1")(
            pts[2], pts[1], f2, pools[1], masks[2], masks[1])
        f3 = _KPResidual(d * 4, d * 8, 4 * r, 4 * s, kcfg, name="encoder3_2")(
            pts[2], pts[2], f3, neigh[2], masks[2], masks[2])
        f3 = _KPResidual(d * 8, d * 8, 4 * r, 4 * s, kcfg, name="encoder3_3")(
            pts[2], pts[2], f3, neigh[2], masks[2], masks[2])

        # decoder interpolation uses the pyramid's UPSAMPLING tables with
        # inverse-squared-distance weights over all entries (vision3d
        # knn_interpolate_pack_mode) — not a fixed-k nearest-neighbor search
        ups = pyr["upsamples"]
        interp = jax.vmap(knn_interpolate_from_table, in_axes=(0, 0, 0, 0))
        l2 = interp(pts[1], pts[2], f3, ups[1])
        l2 = jnp.concatenate([l2, f2], axis=-1)
        l2 = UnaryBlock2D3D(d * 4, name="decoder2")(l2, masks[1])

        l1 = interp(pts[0], pts[1], l2, ups[0])
        l1 = jnp.concatenate([l1, f1], axis=-1)
        l1 = UnaryBlock2D3D(d * 2, name="decoder1")(l1, masks[0])
        l1 = nn.Dense(c.output_dim, name="out_proj")(l1)

        if return_all:
            trace.update({"s2": f2, "s3": f3, "l2": l2, "l1": l1})
            return [l1, l2, f3], trace
        return [l1, l2, f3]
