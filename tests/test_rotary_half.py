"""Half-split rotary layout (TransformerConfig.rotary_half) must be a pure
layout change: the per-head even/odd permutation is folded into the q/k
kernels (identical param pytree), the rotary cos/sin follow the same
permutation, and attention logits are permutation-invariant — outputs match
the interleaved layout up to f32 reassociation. Composes with head-lane
alignment (108 -> two zero-padded 64-lane halves)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffreg_tpu.nn.transformer import (
    GeometryAttentionLayer,
    RepositioningTransformer,
    TransformerConfig,
    embed_rotary_half,
    to_rotary_half,
)
from diffreg_tpu.ops.position_encoding import embed_rotary, volumetric_pe


def test_to_rotary_half_layout():
    # 2 heads x dim 8, dpad 12: evens -> lanes 0..3, odds -> 6..9, pads zero
    x = np.arange(2 * 16, dtype=np.float32).reshape(2, 16)
    y = np.asarray(to_rotary_half(jnp.asarray(x), 2, 8, 12, axis=1))
    assert y.shape == (2, 24)
    for hd in range(2):
        blk = y[:, hd * 12:(hd + 1) * 12]
        src = x[:, hd * 8:(hd + 1) * 8]
        np.testing.assert_array_equal(blk[:, :4], src[:, 0::2])
        np.testing.assert_array_equal(blk[:, 6:10], src[:, 1::2])
        assert (blk[:, 4:6] == 0).all() and (blk[:, 10:] == 0).all()


def test_embed_rotary_half_equals_interleaved():
    """rotate(permute(x)) == permute(rotate(x)) with the permuted cos/sin."""
    rng = np.random.RandomState(0)
    b, n, h, dim, dpad = 2, 6, 4, 108, 128
    x = rng.randn(b, n, h * dim).astype(np.float32)
    # interleaved cos/sin layout is [t0,t0,t1,t1,...]: enforce pairing
    pe = np.repeat(rng.randn(b, n, h * dim // 2, 2).astype(np.float32),
                   2, axis=2)

    ref = np.asarray(embed_rotary(jnp.asarray(x), jnp.asarray(pe[..., 0]),
                                  jnp.asarray(pe[..., 1])))
    xh = to_rotary_half(jnp.asarray(x), h, dim, dpad, axis=-1)
    peh = to_rotary_half(jnp.asarray(pe), h, dim, dpad, axis=-2)
    outh = np.asarray(embed_rotary_half(xh, peh[..., 0], peh[..., 1], h, dpad))
    # map back: half layout position of each interleaved feature
    ref_h = np.asarray(to_rotary_half(jnp.asarray(ref), h, dim, dpad, axis=-1))
    np.testing.assert_allclose(outh, ref_h, rtol=1e-6, atol=1e-6)


def _layer_io(seed, d=432, b=2, n=40, m=56):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    src = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    xyz_x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    xyz_s = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    x_mask = jnp.asarray(rng.rand(b, n) > 0.2)
    s_mask = jnp.asarray(rng.rand(b, m) > 0.2)
    return x, src, xyz_x, xyz_s, x_mask, s_mask


@pytest.mark.parametrize("head_pad", [108, 128])
def test_rotary_half_layer_matches_interleaved(head_pad):
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(0, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")

    base = GeometryAttentionLayer(d, h, "rotary")
    half = GeometryAttentionLayer(d, h, "rotary", head_pad=head_pad,
                                  rotary_half=True)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    out0 = base.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    out1 = half.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid,
                               np.asarray(out1) * valid, rtol=1e-4, atol=1e-5)


def test_rotary_half_param_shapes_identical():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(1, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    half = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                  rotary_half=True)
    params = half.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "proj" in name or "merge" in name:
            assert leaf.shape == (d, d), (name, leaf.shape)


def test_rotary_half_gradients_match():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(2, d=d, n=24, m=24)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary")
    half = GeometryAttentionLayer(d, h, "rotary", head_pad=128,
                                  rotary_half=True)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)

    def loss(mod, p):
        o = mod.apply(p, x, src, x_pe, s_pe, x_mask, s_mask)
        return jnp.sum(jnp.where(x_mask[..., None], o, 0.0) ** 2)

    g0 = jax.grad(lambda p: loss(base, p))(params)
    g1 = jax.grad(lambda p: loss(half, p))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-5, atol=3e-5)


def test_rotary_half_full_transformer():
    """Whole RepositioningTransformer (self/cross/positioning rounds) with
    rotary_half on consumes the same checkpoint and matches."""
    from diffreg_tpu.nn.matching import MatchingConfig

    d = 432
    cfg = TransformerConfig(
        feature_dim=d, n_head=4,
        layer_types=("self", "cross", "positioning", "self", "cross"),
        positioning_type="procrustes",
        feature_matching=MatchingConfig(match_type="dual_softmax",
                                        confidence_threshold=0.1),
    )
    rng = np.random.RandomState(3)
    b, n, m = 2, 36, 44
    src_f = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    tgt_f = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    s_pcd = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    t_pcd = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    s_mask = jnp.asarray(rng.rand(b, n) > 0.15)
    t_mask = jnp.asarray(rng.rand(b, m) > 0.15)

    # rotary_half defaults to auto-ON for 432/4 — pin the base explicitly off
    base = RepositioningTransformer(dataclasses.replace(cfg, rotary_half=False))
    half = RepositioningTransformer(dataclasses.replace(cfg, rotary_half=True))
    params = base.init(jax.random.PRNGKey(0), src_f, tgt_f, s_pcd, t_pcd,
                       s_mask, t_mask)
    o0 = base.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    o1 = half.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    for a, b_, mask in ((o0[0], o1[0], s_mask), (o0[1], o1[1], t_mask)):
        valid = np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(a) * valid,
                                   np.asarray(b_) * valid,
                                   rtol=2e-4, atol=2e-5)
