"""Repositioning transformer — self/cross geometry attention with rotary VolPE.

Re-implements the reference RepositioningTransformer + GeometryAttentionLayer
(Diff-Reg-3dmatch/models/transformero.py:13-284) as Flax modules over padded
[B, S, C] / [B, T, C] token stacks:

  * 'self' / 'cross' layers are full dense attention (coarse token counts are
    a few hundred to ~2k, so quadratic attention on the MXU is the right
    call — SURVEY.md §5 "long-context": no ring/Ulysses needed);
  * the 'positioning' layer runs an inner Matching + SoftProcrustes and
    re-derives the rotary position code from the warped source cloud
    (transformero.py:188-208); 'randSO3' and 'oracle' variants included;
  * masking matches the reference exactly: rows with a valid query attending
    an invalid key get -inf before softmax (transformero.py:81-82);
  * position codes are recomputed from (possibly warped) coordinates each
    time and are stop-gradiented (position_encoding.py:83-84).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.procrustes import soft_procrustes
from ..ops.masked import NEG_INF
from ..ops.position_encoding import embed_pos, embed_rotary, volumetric_pe
from ..utils.precision import get_precision
from .matching import Matching, MatchingConfig


@dataclasses.dataclass(frozen=True)
class ProcrustesConfig:
    sample_rate: float = 1.0
    max_condition_num: float = 0.0
    use_masked_lengths: bool = False  # 4DMatch branch uses mask sums (procrustes.py:61-62)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    feature_dim: int = 432
    n_head: int = 4
    layer_types: Tuple[str, ...] = ("self", "cross", "positioning", "self", "cross")
    positioning_type: str = "procrustes"   # procrustes | randSO3 | oracle
    pe_type: str = "rotary"                # rotary | sinusoidal
    vol_origin: Tuple[float, float, float] = (-3.6, -2.4, 1.14)
    voxel_size: float = 0.08
    entangled: bool = False
    procrustes: ProcrustesConfig = ProcrustesConfig()
    feature_matching: Optional[MatchingConfig] = None
    flash_attention: bool = False          # fused Pallas attention kernel
    # 'bfloat16' runs the attention/FFN activations in bf16 (softmax and
    # LayerNorm stay f32); halves the per-step denoiser traffic in the
    # warp-active DDIM loop
    compute_dtype: Optional[str] = None
    # Pad each attention head to a 128-lane-aligned block (head dim 108 ->
    # 128). The [B,L,C]->[B,L,H,D] head split otherwise straddles TPU lane
    # tiles and forces a Mosaic relayout of every q/k/v/o tensor. Padding is
    # applied by scattering the (unchanged, checkpoint-identical) 432-dim
    # kernels into head-aligned blocks; pad lanes are exactly zero so every
    # dot accumulates +0.0 terms only — equivalent up to f32 accumulation
    # order (measured <=5e-5 rel on CPU; tests/test_head_align.py).
    # None = auto: on when head_dim % 128 != 0, head_dim >= 64 and the
    # padded/true FLOP ratio stays under 4/3 (432/4=108 -> on; 528/4=132
    # would pad to 256, ratio 1.94 -> off).
    align_heads: Optional[bool] = None
    # Half-split rotary lane layout: fold a per-head even/odd permutation
    # into the q/k kernels at trace time so the rotary rotate-90 becomes a
    # contiguous half-swap instead of a stride-2 lane shuffle (a Mosaic
    # relayout). Attention logits are permutation-invariant — outputs are
    # bitwise-equivalent up to f32 reassociation (tests/test_rotary_half.py).
    # None = auto: ON for rotary PE with an even head dim. Measured on v5e
    # (2026-08-19 bench A/B, batch 16 x 4096 pts, 20 DDIM steps): warp-active
    # 19.2 -> 23.2 pairs/s (+21%, ~7 ms/step back), headline 39.5 -> 40.0.
    # Force off with rotary_half=False (bench: DIFFREG_ROTARY_HALF=0).
    rotary_half: Optional[bool] = None
    # Fused rotary+projection: fold the rotary rotate-90 into the q/k
    # kernels as a second (sign-permuted) column block, so each of q/k is
    # ONE [C, 2*C_pad] matmul followed by a single cos/sin fma — no separate
    # rotate pass over the [B,L,C] activations. Self-attention layers
    # further concatenate q/q_rot/k/k_rot/v into ONE [C, 5*C_pad] matmul
    # (attention at 704 tokens is latency- not FLOP-bound on v5e, so trading
    # 2x q/k proj FLOPs for fewer passes is the right direction — measure
    # before defaulting). Checkpoint pytree is unchanged (same
    # q_proj/k_proj/v_proj kernels, permuted at trace time, loop-invariant
    # under nn.scan). None = off (opt-in until measured); bench A/B:
    # DIFFREG_FUSED_ROTARY=1. Parity: tests/test_fused_rotary.py.
    fused_rotary_qkv: Optional[bool] = None
    # Attention logits layout. 'bhls' keeps the [B,H,L,S] batch layout the
    # MXU dot naturally produces (S=704 on the 128-lane minor axis for the
    # softmax); 'blsh' is the einsum layout the code always used. Measured a
    # WASH on v5e (2026-08-19: warp-active 23.10 vs 23.15 pairs/s, headline
    # within the 10% run variance) — XLA already lays the logits out well in
    # either spelling, so the default stays the long-validated 'blsh'. The
    # lever + parity tests (tests/test_logits_layout.py) are kept for other
    # TPU generations. Bench A/B: DIFFREG_LOGITS_LAYOUT=bhls|blsh.
    logits_layout: str = "blsh"
    # Flash (Pallas) kernel tile sizes — autotunable per TPU generation via
    # tools/tune_flash_attention.py. A kv_tile >= the key count collapses
    # the online softmax to a single pass (all keys fit VMEM at coarse
    # sizes). flash_out_f32=False writes the kernel output in the compute
    # dtype (halves the output HBM write when running bf16).
    flash_q_tile: int = 256
    flash_kv_tile: int = 256
    flash_out_f32: bool = True


def resolve_rotary_half(pe_type: str, d_model: int, n_head: int,
                        flag: Optional[bool]) -> bool:
    """Half-split rotary layout policy: auto-on for rotary PE when the
    per-head dim pairs up (even). A no-op layout change for other PE types,
    so auto keeps them on the plain path."""
    if flag is not None:
        return flag
    return pe_type == "rotary" and (d_model // n_head) % 2 == 0


def resolve_head_pad(d_model: int, n_head: int, align: Optional[bool]) -> int:
    """Padded per-head dim under the align_heads policy (== true head dim
    when alignment is off or already aligned)."""
    dim = d_model // n_head
    dpad = -(-dim // 128) * 128
    if align is None:
        align = dim % 128 != 0 and dim >= 64 and 3 * dpad <= 4 * dim
    return dpad if align else dim


def pad_head_lanes(x, n_head: int, dim: int, dpad: int, axis: int = -1):
    """Scatter a flattened-head feature axis [.., H*dim, ..] into the
    head-aligned layout [.., H*dpad, ..] (zero pad lanes at each head tail)."""
    if dpad == dim:
        return x
    axis = axis % x.ndim
    shape = x.shape
    x = x.reshape(shape[:axis] + (n_head, dim) + shape[axis + 1:])
    pads = [(0, 0)] * x.ndim
    pads[axis + 1] = (0, dpad - dim)
    x = jnp.pad(x, pads)
    return x.reshape(shape[:axis] + (n_head * dpad,) + shape[axis + 1:])


def to_rotary_half(x, n_head: int, dim: int, dpad: int, axis: int = -1):
    """Scatter a flattened-head feature axis [.., H*dim, ..] into the
    half-split rotary layout [.., H*dpad, ..]: per head, even (pair-first)
    features land in the first dpad/2 lanes, odd (pair-second) features in
    the second dpad/2, each half zero-padded at its tail.

    With q/k kernels AND the rotary cos/sin both in this layout, the
    interleaved rotate-90 (stride-2 lane shuffle, a Mosaic relayout) becomes
    a contiguous dpad/2-lane half-swap, and attention logits are invariant
    (a common permutation + zero pads on q and k). The permutation is folded
    into the kernels at trace time — zero extra FLOPs, loop-invariant under
    ``nn.scan``.
    """
    assert dim % 2 == 0 and dpad % 2 == 0 and dpad >= dim
    axis = axis % x.ndim
    shape = x.shape
    x = x.reshape(shape[:axis] + (n_head, dim // 2, 2) + shape[axis + 1:])
    x = jnp.moveaxis(x, axis + 2, axis + 1)      # [.., H, 2, dim/2, ..]
    pads = [(0, 0)] * x.ndim
    pads[axis + 2] = (0, (dpad - dim) // 2)
    x = jnp.pad(x, pads)
    return x.reshape(shape[:axis] + (n_head * dpad,) + shape[axis + 1:])


class _HeadAlignedDense(nn.Module):
    """Drop-in for ``nn.Dense(use_bias=False)`` whose output (mode='split')
    or input (mode='merge') feature axis uses the head-aligned block layout.

    The parameter is the ordinary dense ``kernel`` [in, features] (identical
    pytree path and checkpoint layout); at trace time it is scattered so each
    head occupies a ``head_pad``-wide lane block. The scatter is a ~1.5 MB
    reshape+pad, loop-invariant under ``nn.scan``."""
    in_features: int
    features: int
    n_head: int
    head_pad: int
    mode: str                    # 'split' | 'merge'
    dtype: Optional[str] = None
    rotary_half: bool = False    # split mode: half-split rotary layout

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        h, dpad = self.n_head, self.head_pad
        if self.mode == "split":
            scatter = to_rotary_half if self.rotary_half else pad_head_lanes
            k = scatter(kernel, h, self.features // h, dpad, axis=1)
        else:
            k = pad_head_lanes(kernel, h, self.in_features // h, dpad, axis=0)
        return x @ k


class _ProjKernel(nn.Module):
    """Bare dense kernel with the same pytree path/shape/init as
    ``nn.Dense(use_bias=False)`` / ``_HeadAlignedDense`` — used by the fused
    rotary+proj path, which assembles the matmul itself."""
    shape: Tuple[int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def _pe_lanes_impl(pe, d_model: int, n_head: int, dim: int, dpad: int,
                   rotary_half: bool):
    """Rotary cos/sin in the same lane layout as q/k (head-aligned or
    half-split); the shape check keeps pre-transformed PE correct."""
    if pe.shape[-2] != d_model:
        return pe
    if rotary_half:
        return to_rotary_half(pe, n_head, dim, dpad, axis=-2)
    if dpad != dim:
        return pad_head_lanes(pe, n_head, dim, dpad, axis=-2)
    return pe


def rot90_kernel_cols(k, n_head: int, dpad: int, half: bool):
    """Apply the rotary rotate-90 as a column permutation of a projection
    kernel already scattered to the [in, H*dpad] lane layout, so that
    ``rot90(x @ K) == x @ rot90_kernel_cols(K)``.

    half=True: half-split layout (see ``to_rotary_half``) — the pair partner
    is a contiguous dpad/2 block; half=False: interleaved pairs (adjacent
    lanes), matching ``embed_rotary``. Zero pad lanes stay zero either way.
    """
    c = k.shape[0]
    if half:
        k4 = k.reshape(c, n_head, 2, dpad // 2)
        out = jnp.stack([-k4[:, :, 1], k4[:, :, 0]], axis=2)
    else:
        k4 = k.reshape(c, n_head * dpad // 2, 2)
        out = jnp.stack([-k4[..., 1], k4[..., 0]], axis=-1)
    return out.reshape(c, n_head * dpad)


def embed_rotary_half(x, cos, sin, n_head: int, dpad: int):
    """Rotary rotate in the half-split layout (see ``to_rotary_half``):
    the pair partner sits a contiguous dpad/2 lanes away, so the rotate-90
    is a half-swap instead of a stride-2 interleave."""
    b, n, _ = x.shape
    x4 = x.reshape(b, n, n_head, 2, dpad // 2)
    x2 = jnp.stack([-x4[:, :, :, 1], x4[:, :, :, 0]], axis=3)
    out = x4 * cos.reshape(b, n, n_head, 2, dpad // 2) \
        + x2 * sin.reshape(b, n, n_head, 2, dpad // 2)
    return out.reshape(x.shape)


class GeometryAttentionLayer(nn.Module):
    """Pre-PE multi-head attention + gated-concat FFN (transformero.py:13-96)."""
    d_model: int
    n_head: int
    pe_type: str
    use_flash: bool = False
    compute_dtype: Optional[str] = None
    head_pad: Optional[int] = None   # padded per-head dim (None == d_model//n_head)
    rotary_half: bool = False        # q/k + rotary PE in half-split lane layout
    logits_layout: str = "blsh"      # 'blsh' (default) | 'bhls' (measured wash)
    fused_qkv: bool = False          # fused rotary+proj (rotary PE only)
    flash_q_tile: int = 256          # Pallas kernel tiles (see TransformerConfig)
    flash_kv_tile: int = 256
    flash_out_f32: bool = True

    @nn.compact
    def __call__(self, x, source, x_pe, source_pe, x_mask=None, source_mask=None):
        b, n, _ = x.shape
        h = self.n_head
        dim = self.d_model // h
        dpad = self.head_pad or dim
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        in_dtype = x.dtype
        # self-attention detection must happen BEFORE the dtype cast: the
        # casts produce distinct arrays, so a post-cast `x is source` check
        # would never fire in the bf16 production path
        same_src = x is source
        self_attn = same_src and x_pe is source_pe
        if dt is not None:
            x = x.astype(dt)
            source = x if same_src else source.astype(dt)

        fused = (self.fused_qkv and self.pe_type == "rotary"
                 and not self.use_flash and x_pe is not None)
        if fused:
            # fused rotary+proj (see TransformerConfig.fused_rotary_qkv):
            # identical q_proj/k_proj/v_proj kernels, scattered + rot90-
            # permuted at trace time; q/k land rotated via one fma each.
            cc = self.d_model
            wq = _ProjKernel((cc, cc), name="q_proj")()
            wk = _ProjKernel((cc, cc), name="k_proj")()
            wv = _ProjKernel((cc, cc), name="v_proj")()
            merge = (_HeadAlignedDense(cc, cc, h, dpad, "merge", dtype=dt,
                                       name="merge")
                     if dpad != dim else
                     nn.Dense(cc, use_bias=False, name="merge", dtype=dt))
            if dt is not None:
                wq, wk, wv = wq.astype(dt), wk.astype(dt), wv.astype(dt)
            if self.rotary_half:
                scat = lambda w: to_rotary_half(w, h, dim, dpad, axis=1)
            elif dpad != dim:
                scat = lambda w: pad_head_lanes(w, h, dim, dpad, axis=1)
            else:
                scat = lambda w: w
            wq, wk = scat(wq), scat(wk)
            wv = (pad_head_lanes(wv, h, dim, dpad, axis=1)
                  if dpad != dim else wv)
            wqr = rot90_kernel_cols(wq, h, dpad, self.rotary_half)
            wkr = rot90_kernel_cols(wk, h, dpad, self.rotary_half)
            hd = h * dpad

            def _pe_cs(pe, ref_dtype):
                pe = _pe_lanes_impl(pe, self.d_model, h, dim, dpad,
                                    self.rotary_half)
                return (pe[..., 0].astype(ref_dtype),
                        pe[..., 1].astype(ref_dtype))

            if self_attn:
                # self-attention: ONE [C, 5*H*dpad] matmul for q/q_rot/
                # k/k_rot/v
                big = x @ jnp.concatenate([wq, wqr, wk, wkr, wv], axis=1)
                cos, sin = _pe_cs(x_pe, big.dtype)
                qw = big[..., 0 * hd:1 * hd] * cos + big[..., 1 * hd:2 * hd] * sin
                kw = big[..., 2 * hd:3 * hd] * cos + big[..., 3 * hd:4 * hd] * sin
                vw = big[..., 4 * hd:5 * hd]
            else:
                q2 = x @ jnp.concatenate([wq, wqr], axis=1)
                kv = source @ jnp.concatenate([wk, wkr, wv], axis=1)
                qcos, qsin = _pe_cs(x_pe, q2.dtype)
                kcos, ksin = _pe_cs(source_pe, kv.dtype)
                qw = q2[..., :hd] * qcos + q2[..., hd:] * qsin
                kw = kv[..., :hd] * kcos + kv[..., hd:2 * hd] * ksin
                vw = kv[..., 2 * hd:]
        elif dpad != dim or self.rotary_half:
            mk = lambda name, mode, rh=False: _HeadAlignedDense(
                self.d_model, self.d_model, h, dpad, mode, dtype=dt,
                rotary_half=rh, name=name)
            rh = self.rotary_half
            q_proj, k_proj = mk("q_proj", "split", rh), mk("k_proj", "split", rh)
            v_proj = mk("v_proj", "split")
            merge = mk("merge", "merge")
        else:
            q_proj = nn.Dense(self.d_model, use_bias=False, name="q_proj", dtype=dt)
            k_proj = nn.Dense(self.d_model, use_bias=False, name="k_proj", dtype=dt)
            v_proj = nn.Dense(self.d_model, use_bias=False, name="v_proj", dtype=dt)
            merge = nn.Dense(self.d_model, use_bias=False, name="merge", dtype=dt)

        if not fused:
            _pe_lanes = lambda pe: _pe_lanes_impl(
                pe, self.d_model, h, dim, dpad, self.rotary_half)
            if self.pe_type == "sinusoidal":
                q_in = x + (x_pe.astype(x.dtype) if x_pe is not None else 0)
                k_in = source + (source_pe.astype(x.dtype) if source_pe is not None else 0)
                qw, kw = q_proj(q_in), k_proj(k_in)
            elif self.pe_type == "rotary":
                qw, kw = q_proj(x), k_proj(source)
                if x_pe is not None:
                    xp = _pe_lanes(x_pe).astype(qw.dtype)
                    sp = _pe_lanes(source_pe).astype(kw.dtype)
                    if self.rotary_half:
                        qw = embed_rotary_half(qw, xp[..., 0], xp[..., 1], h, dpad)
                        kw = embed_rotary_half(kw, sp[..., 0], sp[..., 1], h, dpad)
                    else:
                        qw = embed_rotary(qw, xp[..., 0], xp[..., 1])
                        kw = embed_rotary(kw, sp[..., 0], sp[..., 1])
            else:
                raise KeyError(self.pe_type)
            vw = v_proj(source)

        qw = qw.reshape(b, -1, h, dpad)
        kw = kw.reshape(b, -1, h, dpad)
        vw = vw.reshape(b, -1, h, dpad)

        if self.use_flash and source_mask is not None:
            # fused Pallas attention — [B,H,L,S] logits never hit HBM. Valid
            # rows match the XLA path; invalid-query rows differ only where
            # the reference also leaves garbage (masked downstream).
            from ..ops.pallas.attention_kernel import masked_attention_pallas

            interpret = jax.devices()[0].platform == "cpu"
            o = masked_attention_pallas(
                qw.transpose(0, 2, 1, 3), kw.transpose(0, 2, 1, 3),
                vw.transpose(0, 2, 1, 3), source_mask, interpret=interpret,
                q_tile=self.flash_q_tile, kv_tile=self.flash_kv_tile,
                scale=1.0 / (dim ** 0.5),
                out_dtype=None if self.flash_out_f32 else qw.dtype)
            o = o.transpose(0, 2, 1, 3)
        elif self.logits_layout == "bhls":
            # [B,H,L,S] is the dot_general batch layout (no transpose) and
            # puts S on the 128-lane minor axis for the mask/scale/softmax
            # passes over the logits — the big per-step HBM tensor.
            if dt is not None:
                # bf16 inputs, f32 logits/softmax, bf16 AV
                a = jnp.einsum("blhd,bshd->bhls", qw, kw,
                               preferred_element_type=jnp.float32)
            else:
                a = jnp.einsum("blhd,bshd->bhls", qw, kw, precision=get_precision())
            if source_mask is not None:
                # reference semantics: mask only (valid q, invalid kv) entries
                bad = x_mask[:, None, :, None] & (~source_mask[:, None, None, :])
                a = jnp.where(bad, NEG_INF, a)
            a = a / jnp.sqrt(jnp.asarray(dim, a.dtype))
            a = jax.nn.softmax(a, axis=-1)
            if dt is not None:
                o = jnp.einsum("bhls,bshd->blhd", a.astype(dt), vw,
                               preferred_element_type=jnp.float32).astype(dt)
            else:
                o = jnp.einsum("bhls,bshd->blhd", a, vw, precision=get_precision())
        else:
            if dt is not None:
                # bf16 inputs, f32 logits/softmax, bf16 AV
                a = jnp.einsum("blhd,bshd->blsh", qw, kw,
                               preferred_element_type=jnp.float32)
            else:
                a = jnp.einsum("blhd,bshd->blsh", qw, kw, precision=get_precision())
            if source_mask is not None:
                # reference semantics: mask only (valid q, invalid kv) entries
                bad = x_mask[:, :, None] & (~source_mask[:, None, :])
                a = jnp.where(bad[..., None], NEG_INF, a)
            a = a / jnp.sqrt(jnp.asarray(dim, a.dtype))
            a = jax.nn.softmax(a, axis=2)
            if dt is not None:
                o = jnp.einsum("blsh,bshd->blhd", a.astype(dt), vw,
                               preferred_element_type=jnp.float32).astype(dt)
            else:
                o = jnp.einsum("blsh,bshd->blhd", a, vw, precision=get_precision())

        message = merge(o.reshape(b, -1, h * dpad))
        message = nn.LayerNorm(name="norm1")(message.astype(jnp.float32))
        if dt is not None:
            message = message.astype(dt)
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(self.d_model * 2, use_bias=False, name="mlp0", dtype=dt)(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, name="mlp1", dtype=dt)(y)
        y = nn.LayerNorm(name="norm2")(y.astype(jnp.float32))
        return x.astype(in_dtype) + y.astype(in_dtype)


class RepositioningTransformer(nn.Module):
    cfg: TransformerConfig

    def setup(self):
        head_pad = resolve_head_pad(self.cfg.feature_dim, self.cfg.n_head,
                                    self.cfg.align_heads)
        rotary_half = resolve_rotary_half(self.cfg.pe_type, self.cfg.feature_dim,
                                          self.cfg.n_head, self.cfg.rotary_half)
        fused_qkv = bool(self.cfg.fused_rotary_qkv)
        modules = {}
        for i, lt in enumerate(self.cfg.layer_types):
            if lt in ("self", "cross"):
                modules[str(i)] = GeometryAttentionLayer(
                    self.cfg.feature_dim, self.cfg.n_head, self.cfg.pe_type,
                    use_flash=self.cfg.flash_attention,
                    compute_dtype=self.cfg.compute_dtype, head_pad=head_pad,
                    rotary_half=rotary_half,
                    logits_layout=self.cfg.logits_layout,
                    fused_qkv=fused_qkv,
                    flash_q_tile=self.cfg.flash_q_tile,
                    flash_kv_tile=self.cfg.flash_kv_tile,
                    flash_out_f32=self.cfg.flash_out_f32,
                    name=f"layer{i}_{lt}")
            elif lt == "positioning":
                if self.cfg.positioning_type == "procrustes":
                    assert self.cfg.feature_matching is not None
                    modules[str(i)] = Matching(self.cfg.feature_matching, name=f"layer{i}_matching")
            else:
                raise KeyError(lt)
        self.layer_modules = modules

    def _pe(self, xyz):
        return volumetric_pe(xyz, self.cfg.feature_dim, self.cfg.vol_origin,
                             self.cfg.voxel_size, self.cfg.pe_type)

    def __call__(self, src_feat, tgt_feat, s_pcd, t_pcd, src_mask, tgt_mask,
                 rot_gt=None, trn_gt=None, transform=None, rng=None):
        """Returns (src_feat, tgt_feat, src_pe, tgt_pe, aux) with aux carrying
        per-positioning-layer conf matrices and poses (for losses/metrics)."""
        cfg = self.cfg
        if transform is not None:
            r, t = transform
            src_wrapped = s_pcd @ jnp.swapaxes(r, 1, 2) + jnp.swapaxes(t, 1, 2)
        else:
            src_wrapped = s_pcd
        src_pe = self._pe(src_wrapped)
        tgt_pe = self._pe(t_pcd)

        aux = {"position_layers": []}

        if cfg.entangled:
            src_feat = embed_pos(cfg.pe_type, src_feat, src_pe)
            tgt_feat = embed_pos(cfg.pe_type, tgt_feat, tgt_pe)
            s_pe = t_pe = None
        else:
            s_pe, t_pe = src_pe, tgt_pe

        for i, lt in enumerate(cfg.layer_types):
            layer = self.layer_modules.get(str(i))
            if lt == "self":
                if src_feat.shape[1] == tgt_feat.shape[1]:
                    # src/tgt self-attention share weights and are
                    # independent: one [2B] batched call halves the kernel
                    # launches and doubles matmul batch (same math)
                    both = jnp.concatenate([src_feat, tgt_feat], axis=0)
                    pe2 = (None if s_pe is None
                           else jnp.concatenate([s_pe, t_pe], axis=0))
                    mask2 = jnp.concatenate([src_mask, tgt_mask], axis=0)
                    both = layer(both, both, pe2, pe2, mask2, mask2)
                    b = src_feat.shape[0]
                    src_feat, tgt_feat = both[:b], both[b:]
                else:
                    src_feat = layer(src_feat, src_feat, s_pe, s_pe, src_mask, src_mask)
                    tgt_feat = layer(tgt_feat, tgt_feat, t_pe, t_pe, tgt_mask, tgt_mask)
            elif lt == "cross":
                src_feat = layer(src_feat, tgt_feat, s_pe, t_pe, src_mask, tgt_mask)
                tgt_feat = layer(tgt_feat, src_feat, t_pe, s_pe, tgt_mask, src_mask)
            elif lt == "positioning":
                if cfg.entangled:
                    continue
                if cfg.positioning_type == "procrustes":
                    conf, match_mask = layer(src_feat, tgt_feat, s_pe, t_pe,
                                             src_mask, tgt_mask, pe_type=cfg.pe_type)
                    res = soft_procrustes(
                        conf, s_pcd, t_pcd, src_mask, tgt_mask,
                        sample_rate=cfg.procrustes.sample_rate,
                        max_condition_num=cfg.procrustes.max_condition_num,
                        use_masked_lengths=cfg.procrustes.use_masked_lengths,
                    )
                    aux["position_layers"].append({
                        "conf_matrix": conf, "match_mask": match_mask,
                        "rotation": res.rotation, "translation": res.translation,
                        "condition": res.condition, "solution_mask": res.solution_mask,
                    })
                    src_wrapped = s_pcd @ jnp.swapaxes(res.rotation_fwd, 1, 2) \
                        + jnp.swapaxes(res.translation_fwd, 1, 2)
                elif cfg.positioning_type == "randSO3":
                    src_wrapped = _rand_rot_pcd(rng, s_pcd, src_mask)
                elif cfg.positioning_type == "oracle":
                    src_wrapped = s_pcd @ jnp.swapaxes(rot_gt, 1, 2) + jnp.swapaxes(trn_gt, 1, 2)
                else:
                    raise KeyError(cfg.positioning_type)
                s_pe = src_pe = self._pe(src_wrapped)
                t_pe = tgt_pe = self._pe(t_pcd)
            else:
                raise KeyError(lt)

        return src_feat, tgt_feat, src_pe, tgt_pe, aux


def _rand_rot_pcd(rng, pcd, mask):
    """Random SO(3) rotation about the (masked) centroid (transformero.py:262-279)."""
    b, n, _ = pcd.shape
    pcd = pcd * mask[..., None]
    n_points = mask.sum(axis=1).reshape(-1, 1, 1)
    euler = jax.random.uniform(rng, (b, 3)) * 2.0 * jnp.pi
    rot = _euler_zyx_to_matrix(euler)
    centroid = pcd.mean(axis=1, keepdims=True) * n / jnp.maximum(n_points, 1)
    centered = pcd - centroid
    return centered @ jnp.swapaxes(rot, 1, 2) + centroid


def _euler_zyx_to_matrix(euler):
    """Intrinsic z-y-x Euler angles -> rotation matrices [B, 3, 3]."""
    z, y, x = euler[:, 0], euler[:, 1], euler[:, 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    rz = jnp.stack([cz, -sz, jnp.zeros_like(cz), sz, cz, jnp.zeros_like(cz),
                    jnp.zeros_like(cz), jnp.zeros_like(cz), jnp.ones_like(cz)], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, jnp.zeros_like(cy), sy, jnp.zeros_like(cy), jnp.ones_like(cy),
                    jnp.zeros_like(cy), -sy, jnp.zeros_like(cy), cy], -1).reshape(-1, 3, 3)
    rx = jnp.stack([jnp.ones_like(cx), jnp.zeros_like(cx), jnp.zeros_like(cx),
                    jnp.zeros_like(cx), cx, -sx, jnp.zeros_like(cx), sx, cx], -1).reshape(-1, 3, 3)
    return rz @ ry @ rx
