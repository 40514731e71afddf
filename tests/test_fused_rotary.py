"""Fused rotary+projection (TransformerConfig.fused_rotary_qkv) must be a
pure scheduling change: the rotary rotate-90 is folded into the q/k kernels
as a sign-permuted column block (rot90(x @ K) == x @ rot90_kernel_cols(K)),
so q/k land rotated after one fma and self-attention runs one [C, 5*C_pad]
matmul. Same param pytree; outputs match the unfused layer up to f32
reassociation. Composes with head-lane alignment and the half-split rotary
layout (both lane layouts covered)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffreg_tpu.nn.transformer import (
    GeometryAttentionLayer,
    RepositioningTransformer,
    TransformerConfig,
    pad_head_lanes,
    resolve_head_pad,
    resolve_rotary_half,
    rot90_kernel_cols,
    to_rotary_half,
)
from diffreg_tpu.ops.position_encoding import embed_rotary, volumetric_pe


def test_rot90_kernel_cols_interleaved():
    """x @ rot90_cols(K) == rot90(x @ K) in the interleaved layout."""
    rng = np.random.RandomState(0)
    c, h, dim = 24, 2, 12
    k = jnp.asarray(rng.randn(c, h * dim).astype(np.float32))
    x = jnp.asarray(rng.randn(5, c).astype(np.float32))
    y = x @ k
    rot = jnp.stack([-y[..., 1::2], y[..., 0::2]], axis=-1).reshape(y.shape)
    out = x @ rot90_kernel_cols(k, h, dim, half=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rot),
                               rtol=1e-5, atol=1e-5)


def test_rot90_kernel_cols_half_split():
    """Same identity in the half-split layout (incl. zero pad lanes)."""
    rng = np.random.RandomState(1)
    c, h, dim, dpad = 24, 2, 12, 16
    k = jnp.asarray(rng.randn(c, h * dim).astype(np.float32))
    ks = to_rotary_half(k, h, dim, dpad, axis=1)
    x = jnp.asarray(rng.randn(5, c).astype(np.float32))
    y = np.asarray(x @ ks).reshape(5, h, 2, dpad // 2)
    rot = np.stack([-y[:, :, 1], y[:, :, 0]], axis=2).reshape(5, h * dpad)
    out = np.asarray(x @ rot90_kernel_cols(ks, h, dpad, half=True))
    np.testing.assert_allclose(out, rot, rtol=1e-5, atol=1e-5)


def _layer_io(seed, d=432, b=2, n=40, m=56):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    src = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    xyz_x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    xyz_s = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    x_mask = jnp.asarray(rng.rand(b, n) > 0.2)
    s_mask = jnp.asarray(rng.rand(b, m) > 0.2)
    return x, src, xyz_x, xyz_s, x_mask, s_mask


@pytest.mark.parametrize("head_pad,rotary_half",
                         [(108, False), (128, False), (128, True)])
def test_fused_cross_matches_unfused(head_pad, rotary_half):
    """Cross-attention (x != source): fused path == unfused, all layouts."""
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(0, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")

    base = GeometryAttentionLayer(d, h, "rotary", head_pad=head_pad,
                                  rotary_half=rotary_half)
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=head_pad,
                                   rotary_half=rotary_half, fused_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    out0 = base.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    out1 = fused.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid,
                               np.asarray(out1) * valid, rtol=1e-4, atol=1e-5)


def test_fused_self_single_matmul_matches():
    """Self-attention (x is source): the one-big-matmul path == unfused."""
    d, h = 432, 4
    x, _, xyz_x, _, x_mask, _ = _layer_io(1, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                  rotary_half=True)
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                   rotary_half=True, fused_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, x, x_pe, x_pe, x_mask, x_mask)
    out0 = base.apply(params, x, x, x_pe, x_pe, x_mask, x_mask)
    out1 = fused.apply(params, x, x, x_pe, x_pe, x_mask, x_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid,
                               np.asarray(out1) * valid, rtol=1e-4, atol=1e-5)


def test_fused_self_single_matmul_fires_in_bf16():
    """Regression (ADVICE r4): the self-attention detection must happen
    before the compute_dtype cast — bf16 mode used to silently fall back to
    the cross branch (3 projection matmuls instead of 1). Assert parity AND
    that the traced program has exactly 2 dot_generals (5-block proj +
    merge), not 3."""
    d, h = 432, 4
    x, _, xyz_x, _, x_mask, _ = _layer_io(5, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                  rotary_half=True, compute_dtype="bfloat16")
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                   rotary_half=True, fused_qkv=True,
                                   compute_dtype="bfloat16")
    params = base.init(jax.random.PRNGKey(0), x, x, x_pe, x_pe, x_mask, x_mask)
    out0 = base.apply(params, x, x, x_pe, x_pe, x_mask, x_mask)
    out1 = fused.apply(params, x, x, x_pe, x_pe, x_mask, x_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid,
                               np.asarray(out1) * valid, rtol=3e-2, atol=3e-2)

    def count_dots(mod):
        jaxpr = jax.make_jaxpr(
            lambda p: mod.apply(p, x, x, x_pe, x_pe, x_mask, x_mask))(params)
        return sum(1 for eqn in jaxpr.jaxpr.eqns
                   if eqn.primitive.name == "dot_general")

    # base: q/k/v proj + logits + attn@v + merge (+2 in the gated FFN) = 8;
    # fused self-attention folds q/k/v into ONE matmul = 6
    assert count_dots(fused) == count_dots(base) - 2


def test_fused_param_pytree_identical():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(2, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary", head_pad=128, rotary_half=True)
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                   rotary_half=True, fused_qkv=True)
    p0 = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    p1 = fused.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    s0 = jax.tree_util.tree_map(lambda a: a.shape, p0)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, p1)
    assert s0 == s1


def test_fused_gradients_match():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(3, d=d, n=24, m=24)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary", head_pad=128, rotary_half=True)
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                   rotary_half=True, fused_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)

    def loss(mod, p):
        o = mod.apply(p, x, src, x_pe, s_pe, x_mask, s_mask)
        return jnp.sum(jnp.where(x_mask[..., None], o, 0.0) ** 2)

    g0 = jax.grad(lambda p: loss(base, p))(params)
    g1 = jax.grad(lambda p: loss(fused, p))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)


def test_fused_full_transformer_same_checkpoint():
    """Whole RepositioningTransformer with fused_rotary_qkv consumes the same
    checkpoint and matches (auto head-pad + rotary-half layouts active)."""
    from diffreg_tpu.nn.matching import MatchingConfig

    d = 432
    cfg = TransformerConfig(
        feature_dim=d, n_head=4,
        layer_types=("self", "cross", "positioning", "self", "cross"),
        positioning_type="procrustes",
        feature_matching=MatchingConfig(match_type="dual_softmax",
                                        confidence_threshold=0.1),
    )
    rng = np.random.RandomState(4)
    b, n, m = 2, 36, 36
    src_f = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    tgt_f = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    s_pcd = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    t_pcd = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    s_mask = jnp.asarray(rng.rand(b, n) > 0.15)
    t_mask = jnp.asarray(rng.rand(b, m) > 0.15)

    base = RepositioningTransformer(cfg)
    fused = RepositioningTransformer(
        dataclasses.replace(cfg, fused_rotary_qkv=True))
    params = base.init(jax.random.PRNGKey(0), src_f, tgt_f, s_pcd, t_pcd,
                       s_mask, t_mask)
    o0 = base.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    o1 = fused.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    for a, b_, mask in ((o0[0], o1[0], s_mask), (o0[1], o1[1], t_mask)):
        valid = np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(a) * valid,
                                   np.asarray(b_) * valid,
                                   rtol=2e-4, atol=2e-5)


def test_fused_bf16_compute_dtype():
    """Fused path under the bf16 fast path stays close to the unfused bf16
    layer (same dtype policy: bf16 matmuls, f32 softmax/LN)."""
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(5, d=d, n=24, m=32)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                  rotary_half=True, compute_dtype="bfloat16")
    fused = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                   rotary_half=True, compute_dtype="bfloat16",
                                   fused_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    out0 = base.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    out1 = fused.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid,
                               np.asarray(out1) * valid, rtol=0.08, atol=0.05)
