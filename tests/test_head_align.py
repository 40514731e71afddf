"""Head-lane alignment (TransformerConfig.align_heads) must be a pure layout
change: identical params (same pytree, same init), numerically identical
outputs. The padded lanes are zeros so every extra MXU/VPU term is +0.0."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffreg_tpu.nn.transformer import (
    GeometryAttentionLayer,
    pad_head_lanes,
    resolve_head_pad,
)
from diffreg_tpu.ops.position_encoding import volumetric_pe


def test_resolve_head_pad_policy():
    # flagship 432/4 = 108 -> pad to 128 (ratio 1.19 < 4/3)
    assert resolve_head_pad(432, 4, None) == 128
    # already aligned: no pad
    assert resolve_head_pad(512, 4, None) == 128
    # 528/4 = 132 would pad to 256 (ratio 1.94) -> auto off
    assert resolve_head_pad(528, 4, None) == 132
    # tiny head dims (< 64): auto off
    assert resolve_head_pad(48, 4, None) == 12
    # explicit overrides win
    assert resolve_head_pad(528, 4, True) == 256
    assert resolve_head_pad(432, 4, False) == 108


def test_pad_head_lanes_layout():
    x = np.arange(2 * 216, dtype=np.float32).reshape(2, 216)  # 2 heads x 108
    y = np.asarray(pad_head_lanes(jnp.asarray(x), 2, 108, 128, axis=1))
    assert y.shape == (2, 256)
    np.testing.assert_array_equal(y[:, :108], x[:, :108])
    np.testing.assert_array_equal(y[:, 128:236], x[:, 108:])
    assert (y[:, 108:128] == 0).all() and (y[:, 236:] == 0).all()


def _layer_io(seed, d=432, b=2, n=40, m=56):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    src = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    xyz_x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    xyz_s = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    x_mask = jnp.asarray(rng.rand(b, n) > 0.2)
    s_mask = jnp.asarray(rng.rand(b, m) > 0.2)
    return x, src, xyz_x, xyz_s, x_mask, s_mask


@pytest.mark.parametrize("pe_type", ["rotary", "sinusoidal"])
def test_aligned_layer_matches_unaligned(pe_type):
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(0, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, pe_type)
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, pe_type)

    base = GeometryAttentionLayer(d, h, pe_type)
    aligned = GeometryAttentionLayer(d, h, pe_type, head_pad=128)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    # identical param pytree: the aligned layer consumes the same checkpoint
    out0 = base.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    out1 = aligned.apply(params, x, src, x_pe, s_pe, x_mask, s_mask)
    valid = np.asarray(x_mask)[..., None]
    np.testing.assert_allclose(np.asarray(out0) * valid, np.asarray(out1) * valid,
                               rtol=1e-4, atol=1e-5)


def test_aligned_param_shapes_identical():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(1, d=d)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    aligned = GeometryAttentionLayer(d, h, "rotary", head_pad=128)
    params = aligned.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "proj" in name or "merge" in name:
            assert leaf.shape == (d, d), (name, leaf.shape)


def test_aligned_gradients_match():
    d, h = 432, 4
    x, src, xyz_x, xyz_s, x_mask, s_mask = _layer_io(2, d=d, n=24, m=24)
    x_pe = volumetric_pe(xyz_x, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    s_pe = volumetric_pe(xyz_s, d, (0.0, 0.0, 0.0), 0.08, "rotary")
    base = GeometryAttentionLayer(d, h, "rotary")
    aligned = GeometryAttentionLayer(d, h, "rotary", head_pad=128)
    params = base.init(jax.random.PRNGKey(0), x, src, x_pe, s_pe, x_mask, s_mask)

    def loss(mod, p):
        o = mod.apply(p, x, src, x_pe, s_pe, x_mask, s_mask)
        return jnp.sum(jnp.where(x_mask[..., None], o, 0.0) ** 2)

    g0 = jax.grad(lambda p: loss(base, p))(params)
    g1 = jax.grad(lambda p: loss(aligned, p))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-5)
