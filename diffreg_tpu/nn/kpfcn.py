"""KPFCN — kernel-point feature pyramid backbone (Flax).

Re-implements the reference KPFCN (Diff-Reg-3dmatch/models/backbone.py:6-160
and blocks.py) on padded static-shape pyramids:

  * the architecture string list drives block construction exactly as
    backbone.py:27-109 does (dims: simple halves out_dim, strided doubles,
    decoder concats skip features after each upsample);
  * normalization is the reference's InstanceNorm-as-"BatchNorm" quirk
    (blocks.py:415-447), computed under the validity mask (ops.masked);
  * all neighbor tables are fixed-K, sentinel-padded, built by the data
    pipeline; the conv itself is ops.kpconv (gather + MXU einsum);
  * forward(phase='coarse') returns level-``coarse_level`` features through
    the 1x1 ``coarse_out`` head after decoder block 1 (backbone.py:151-160);
    the remaining decoder blocks + ``fine_out`` exist for parameter parity
    with released checkpoints and for the fine phase.

Batched: every array has a leading batch axis; the functional ops are vmapped.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.kpconv import closest_pool as _closest_pool
from ..ops.kpconv import kpconv as _kpconv
from ..ops.kpconv import max_pool as _max_pool
from ..ops.kernel_points import load_kernel_points
from ..ops.masked import masked_instance_norm


@dataclasses.dataclass(frozen=True)
class KPFCNConfig:
    architecture: Tuple[str, ...]
    num_kernel_points: int = 15
    in_points_dim: int = 3
    first_feats_dim: int = 256
    in_feats_dim: int = 1
    first_subsampling_dl: float = 0.025
    conv_radius: float = 2.5
    kp_extent: float = 2.0
    kp_influence: str = "linear"
    aggregation_mode: str = "sum"
    fixed_kernel_points: str = "center"
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.02
    coarse_feature_dim: int = 432
    fine_feature_dim: int = 264
    # deformable-KPConv family (blocks.py:124-260): block names containing
    # 'deform' predict per-query kernel offsets; `modulated` additionally
    # predicts per-kernel-point sigmoid gains (blocks.py:164-178)
    modulated: bool = False
    # opt-in Pallas fused conv (parity-tested; slower than XLA on v5e —
    # see ops.kpconv.kpconv_batched)
    use_pallas_kpconv: bool = False
    # 'bfloat16' halves conv gather/contraction traffic (f32 accumulation)
    compute_dtype: Optional[str] = None
    coarse_level: int = -2


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class NormBlock(nn.Module):
    """Reference BatchNormBlock: masked per-channel instance norm, or bias."""
    dim: int
    use_bn: bool

    @nn.compact
    def __call__(self, x, mask):
        if self.use_bn:
            return masked_instance_norm(x, mask)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x + bias


class UnaryBlock(nn.Module):
    out_dim: int
    use_bn: bool = True
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_dim, use_bias=False)(x)
        x = NormBlock(self.out_dim, self.use_bn)(x, mask)
        if not self.no_relu:
            x = _leaky(x)
        return x


class KPConvLayer(nn.Module):
    """One kernel-point convolution with its (fixed) dispositions.

    ``deformable=True`` switches to the deformed-kernel variant
    (blocks.py:124-260): an extra rigid conv predicts per-query kernel
    offsets (+ modulations when ``cfg.modulated``); the deformation
    running variables (``min_d2``, ``deformed_kp``) are sown into the
    ``intermediates`` collection for the fitting regularizer — the flax
    twin of the reference storing them on the module (blocks.py:154-157).
    """
    in_dim: int
    out_dim: int
    radius: float          # layer radius (kernel disposition scale)
    extent: float          # KP influence extent
    cfg: KPFCNConfig
    deformable: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, q_mask=None):
        # [B, ...] batched; vmap the per-pair functional conv.
        weights = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0 / self.cfg.num_kernel_points, "fan_in", "uniform"),
            (self.cfg.num_kernel_points, self.in_dim, self.out_dim),
        )
        # Kernel dispositions are data (non-trainable); stored in a separate
        # collection so checkpoint conversion can overwrite them with the
        # reference's cached random-rotated set.
        kp_init = load_kernel_points(
            self.radius, self.cfg.num_kernel_points, self.cfg.in_points_dim,
            self.cfg.fixed_kernel_points,
        )
        kp = self.variable("buffers", "kernel_points", lambda: jnp.asarray(kp_init))
        compute_dtype = (jnp.dtype(self.cfg.compute_dtype)
                         if self.cfg.compute_dtype else None)

        if self.deformable:
            from ..ops.kpconv import kpconv_deformable

            p = self.cfg.num_kernel_points
            offset_dim = (4 if self.cfg.modulated else 3) * p
            offset_weights = self.param(
                "offset_weights",
                nn.initializers.variance_scaling(2.0 / p, "fan_in", "uniform"),
                (p, self.in_dim, offset_dim))
            offset_bias = self.param(
                "offset_bias", nn.initializers.zeros, (offset_dim,))
            # the reference's offset_conv carries its own kernel
            # dispositions (separate load_kernels call, blocks.py:169-177);
            # kept as a second buffer for exact checkpoint conversion
            okp = self.variable("buffers", "offset_kernel_points",
                                lambda: jnp.asarray(kp_init))
            conv = jax.vmap(
                kpconv_deformable,
                in_axes=(0, 0, 0, 0, None, None, None, None, None, None,
                         None, None, None, None))
            out, aux = conv(q_pts, s_pts, neighb_inds, x, kp.value, weights,
                            offset_weights, offset_bias, self.extent,
                            self.cfg.kp_influence, self.cfg.aggregation_mode,
                            self.cfg.modulated, compute_dtype, okp.value)
            self.sow("intermediates", "deform_aux", {
                "min_d2": aux["min_d2"],
                "deformed_kp": aux["deformed_kp"],
                "kp_extent": jnp.asarray(self.extent, jnp.float32),
                "q_mask": (q_mask if q_mask is not None
                           else jnp.ones(out.shape[:-1], bool)),
            })
            return out

        from ..ops.kpconv import kpconv_batched

        return kpconv_batched(
            q_pts, s_pts, neighb_inds, x, kp.value, weights, self.extent,
            self.cfg.kp_influence, self.cfg.aggregation_mode,
            use_pallas=self.cfg.use_pallas_kpconv,
            compute_dtype=compute_dtype)


class SimpleBlock(nn.Module):
    """KPConv -> norm -> leaky (reference blocks.py:518-572)."""
    in_dim: int
    out_dim: int       # NOTE: conv outputs out_dim // 2 like the reference
    radius: float
    layer_ind: int
    strided: bool
    cfg: KPFCNConfig
    deformable: bool = False

    @nn.compact
    def __call__(self, x, pyr):
        q_pts, s_pts, inds, q_mask = _conv_io(pyr, self.layer_ind, self.strided)
        extent = self.radius * self.cfg.kp_extent / self.cfg.conv_radius
        x = KPConvLayer(self.in_dim, self.out_dim // 2, self.radius, extent,
                        self.cfg, deformable=self.deformable)(
            q_pts, s_pts, inds, x, q_mask)
        x = NormBlock(self.out_dim // 2, self.cfg.use_batch_norm)(x, q_mask)
        return _leaky(x)


class ResnetBottleneckBlock(nn.Module):
    """unary(in->out/4) -> KPConv -> unary(out/4->out) + shortcut (blocks.py:575-660)."""
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    strided: bool
    cfg: KPFCNConfig
    deformable: bool = False

    @nn.compact
    def __call__(self, x, pyr):
        q_pts, s_pts, inds, q_mask = _conv_io(pyr, self.layer_ind, self.strided)
        s_mask = pyr["masks"][self.layer_ind]
        extent = self.radius * self.cfg.kp_extent / self.cfg.conv_radius
        mid = self.out_dim // 4

        h = x
        if self.in_dim != mid:
            h = UnaryBlock(mid, self.cfg.use_batch_norm, no_relu=False)(h, s_mask)
        h = KPConvLayer(mid, mid, self.radius, extent, self.cfg,
                        deformable=self.deformable)(q_pts, s_pts, inds, h, q_mask)
        h = NormBlock(mid, self.cfg.use_batch_norm)(h, q_mask)
        h = _leaky(h)
        h = UnaryBlock(self.out_dim, self.cfg.use_batch_norm, no_relu=True)(h, q_mask)

        if self.strided:
            shortcut = jax.vmap(_max_pool)(x, inds)
        else:
            shortcut = x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, self.cfg.use_batch_norm, no_relu=True)(
                shortcut, q_mask)
        return _leaky(h + shortcut)


class LevelUnaryBlock(nn.Module):
    """UnaryBlock bound to a pyramid level (for uniform (x, pyr) interface)."""
    out_dim: int
    use_bn: bool
    level: int

    @nn.compact
    def __call__(self, x, pyr):
        return UnaryBlock(self.out_dim, self.use_bn)(x, pyr["masks"][self.level])


class NearestUpsampleBlock(nn.Module):
    layer_ind: int  # upsampling from layer_ind to layer_ind - 1

    @nn.compact
    def __call__(self, x, pyr):
        inds = pyr["upsamples"][self.layer_ind - 1]  # queries at level l-1 into level l
        return jax.vmap(_closest_pool)(x, inds)


def _conv_io(pyr, layer_ind, strided):
    if strided:
        q_pts = pyr["points"][layer_ind + 1]
        q_mask = pyr["masks"][layer_ind + 1]
        inds = pyr["pools"][layer_ind]
    else:
        q_pts = pyr["points"][layer_ind]
        q_mask = pyr["masks"][layer_ind]
        inds = pyr["neighbors"][layer_ind]
    s_pts = pyr["points"][layer_ind]
    return q_pts, s_pts, inds, q_mask


class KPFCN(nn.Module):
    """Encoder/decoder kernel-point FCN; returns coarse features.

    Construction mirrors backbone.py: dims evolve per block type, encoder
    skips recorded before each strided block, decoder concats after each
    upsample, ``coarse_out`` applied after decoder block index 1.
    """
    cfg: KPFCNConfig

    def setup(self):
        cfg = self.cfg
        arch = cfg.architecture

        layer = 0
        r = cfg.first_subsampling_dl * cfg.conv_radius
        in_dim = cfg.in_feats_dim
        out_dim = cfg.first_feats_dim

        enc = []
        encoder_skip_dims = []
        encoder_skips = []
        for bi, block in enumerate(arch):
            if any(k in block for k in ("pool", "strided", "upsample", "global")):
                encoder_skips.append(bi)
                encoder_skip_dims.append(in_dim)
            if "upsample" in block:
                break
            strided = "strided" in block
            deform = "deform" in block  # blocks.py:551, 614
            if block == "unary":
                enc.append(LevelUnaryBlock(out_dim, cfg.use_batch_norm, layer, name=f"enc{bi}_unary"))
            elif "simple" in block:
                enc.append(SimpleBlock(in_dim, out_dim, r, layer, strided, cfg,
                                       deformable=deform, name=f"enc{bi}_simple"))
            elif "resnetb" in block:
                enc.append(ResnetBottleneckBlock(in_dim, out_dim, r, layer, strided, cfg,
                                                 deformable=deform, name=f"enc{bi}_resnetb"))
            else:
                raise ValueError(block)
            in_dim = out_dim // 2 if "simple" in block else out_dim
            if "pool" in block or "strided" in block:
                layer += 1
                r *= 2
                out_dim *= 2
        self.encoder_blocks = enc
        self.encoder_skips = tuple(encoder_skips)
        self.encoder_skip_dims = tuple(encoder_skip_dims)

        # bottleneck heads (backbone.py:66-68)
        self.coarse_out = nn.Dense(cfg.coarse_feature_dim, use_bias=True, name="coarse_out")
        self.coarse_in = nn.Dense(in_dim // 2, use_bias=True, name="coarse_in")

        # decoder
        dec = []
        decoder_concats = []
        start_i = next(i for i, b in enumerate(arch) if "upsample" in b)
        for bi, block in enumerate(arch[start_i:]):
            if bi > 0 and "upsample" in arch[start_i + bi - 1]:
                in_dim += encoder_skip_dims[layer]
                decoder_concats.append(bi)
            if block == "unary":
                dec.append(LevelUnaryBlock(out_dim, cfg.use_batch_norm, layer, name=f"dec{bi}_unary"))
            elif "upsample" in block:
                dec.append(NearestUpsampleBlock(layer, name=f"dec{bi}_upsample"))
            else:
                raise ValueError(block)
            in_dim = out_dim
            if "upsample" in block:
                layer -= 1
                r *= 0.5
                out_dim = out_dim // 2
        self.decoder_blocks = dec
        self.decoder_concats = tuple(decoder_concats)
        self.fine_out = nn.Dense(cfg.fine_feature_dim, use_bias=True, name="fine_out")

        # levels of each encoder block output (for masks during decode)
        self._coarse_level = cfg.coarse_level

    def __call__(self, pyr, phase="coarse"):
        """pyr: dict with points/masks/neighbors/pools/upsamples/features (batched)."""
        x = pyr["features"]
        skips = []
        for bi, block in enumerate(self.encoder_blocks):
            if bi in self.encoder_skips:
                skips.append(x)
            x = block(x, pyr)

        num_levels = len(pyr["points"])
        coarse_level = self._coarse_level % num_levels
        level = num_levels - 1
        for bi, block in enumerate(self.decoder_blocks):
            if bi in self.decoder_concats:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(x, pyr)
            if isinstance(block, NearestUpsampleBlock):
                level -= 1
            if phase == "coarse" and bi == 1:
                return self.coarse_out(x)  # [B, N_coarse, coarse_feature_dim]
        return self.fine_out(x)
