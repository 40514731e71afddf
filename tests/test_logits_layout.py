"""Attention logits layout (TransformerConfig.logits_layout) must be a pure
layout change: 'bhls' keeps the [B,H,L,S] batch layout the dot naturally
produces (S on the lane axis for mask/scale/softmax), 'blsh' is the legacy
H-minor layout. Identical dot products — outputs and gradients must match up
to f32 reassociation, in f32 and in the bf16 compute path, and compose with
the rotary-half and head-align levers."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffreg_tpu.nn.transformer import (
    GeometryAttentionLayer,
    RepositioningTransformer,
    TransformerConfig,
)
from diffreg_tpu.ops.position_encoding import volumetric_pe


def _layer_io(seed, d=432, b=2, n=40, m=56):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    src = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    xyz_x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    xyz_s = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    x_mask = jnp.asarray(rng.rand(b, n) > 0.2)
    s_mask = jnp.asarray(rng.rand(b, m) > 0.2)
    return x, src, xyz_x, xyz_s, x_mask, s_mask


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
@pytest.mark.parametrize("rotary_half", [False, True])
def test_bhls_layer_matches_legacy(compute_dtype, rotary_half):
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(0, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")

    kw = dict(compute_dtype=compute_dtype, rotary_half=rotary_half,
              head_pad=128 if rotary_half else None)
    legacy = GeometryAttentionLayer(d, h, "rotary", logits_layout="blsh", **kw)
    bhls = GeometryAttentionLayer(d, h, "rotary", logits_layout="bhls", **kw)
    params = legacy.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    out0 = legacy.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    out1 = bhls.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    valid = np.asarray(x_mask)[..., None]
    tol = dict(rtol=1e-4, atol=1e-5) if compute_dtype is None \
        else dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out0, np.float32) * valid,
                               np.asarray(out1, np.float32) * valid, **tol)


def test_bhls_gradients_match():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(2, d=d, n=24, m=24)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    legacy = GeometryAttentionLayer(d, h, "rotary", logits_layout="blsh")
    bhls = GeometryAttentionLayer(d, h, "rotary", logits_layout="bhls")
    params = legacy.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)

    def loss(mod, p):
        o = mod.apply(p, x, src, x_pe, s_pe, x_mask, s_mask)
        return jnp.sum(jnp.where(x_mask[..., None], o, 0.0) ** 2)

    g0 = jax.grad(lambda p: loss(legacy, p))(params)
    g1 = jax.grad(lambda p: loss(bhls, p))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-5, atol=3e-5)


def test_bhls_full_transformer_matches_legacy():
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

    legacy = RepositioningTransformer(dataclasses.replace(cfg, logits_layout="blsh"))
    bhls = RepositioningTransformer(dataclasses.replace(cfg, logits_layout="bhls"))
    params = legacy.init(jax.random.PRNGKey(0), src_f, tgt_f, s_pcd, t_pcd,
                         s_mask, t_mask)
    o0 = legacy.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    o1 = bhls.apply(params, src_f, tgt_f, s_pcd, t_pcd, s_mask, t_mask)
    for a, b_, mask in ((o0[0], o1[0], s_mask), (o0[1], o1[1], t_mask)):
        valid = np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(a) * valid,
                                   np.asarray(b_) * valid,
                                   rtol=2e-4, atol=2e-5)
