"""Checkpoint-converter validation against a REAL reference state_dict.

Instantiates the reference torch Pipeline (Diff-Reg-3dmatch/models/
pipeline.py:130) with its test config, converts its state_dict with
tools/convert_checkpoint.py, grafts into the flax DiffusionMatchingModel, and
asserts (a) key-complete load, (b) per-module numeric parity vs the torch
forward on identical inputs (VERDICT.md round-1 item 3).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo/tests")

from convert_checkpoint import convert_state_dict, graft_into_variables

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    from reference_utils import load_reference_pipeline

    pipe, config = load_reference_pipeline()
    sd = pipe.state_dict()
    from diffreg_tpu.models.presets import KPFCN_ARCHITECTURE

    params_flat, buffers_flat = convert_state_dict(sd, KPFCN_ARCHITECTURE)
    return pipe, config, sd, params_flat, buffers_flat


@pytest.fixture(scope="module")
def flax_model():
    import dataclasses

    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch

    cfg = preset_3dmatch(sample_steps=2)
    tf = dataclasses.replace(cfg.coarse_transformer, flash_attention=False)
    cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    model = DiffusionMatchingModel(cfg)
    batch, _, _ = synthetic_batch(batch_size=1, n_points=192, seed=0)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda b, r: model.init({"params": r}, b, r, mode="train"), batch, rng)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    return model, variables


def test_conversion_is_key_complete(ref, flax_model):
    """Every flax param/buffer has a converted source with the right shape;
    every converted tensor either lands or is a known-dead reference param;
    every torch element is accounted for."""
    pipe, config, sd, params_flat, buffers_flat = ref
    _, variables = flax_model

    grafted, dropped = graft_into_variables(variables, params_flat, buffers_flat)

    n_landed = sum(x.size for x in jax.tree.leaves(grafted["params"]))
    n_landed += sum(x.size for x in jax.tree.leaves(grafted["buffers"]))
    n_torch = sum(v.numel() for k, v in sd.items()
                  if not k.startswith(("alphas", "sqrt_")))  # schedule recomputed
    n_dropped = sum(np.asarray({**params_flat, **buffers_flat}[k]).size for k in dropped)
    assert n_landed + n_dropped == n_torch


def test_schedule_parity(ref):
    """Cosine beta schedule matches the registered torch buffers
    (pipeline.py:83-93, 155-162)."""
    pipe, *_ = ref
    from diffreg_tpu.diffusion.schedule import make_schedule

    sched = make_schedule(1000)
    for name in ("alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod"):
        ours = np.asarray(getattr(sched, name))
        theirs = pipe.state_dict()[name].numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _tree_get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def test_kpconv_parity(ref):
    """Single kernel-point conv: torch KPConv module vs ops.kpconv with the
    converted weights + kernel dispositions on identical inputs (sentinel
    contract: index == Ns is the shadow point, blocks.py:253-254)."""
    pipe, *_ = ref
    m = pipe.backbone.encoder_blocks[1].KPConv  # enc1 resnetb conv, 64->64
    rs = np.random.RandomState(3)
    nq, ns, k, cin = 40, 56, 12, m.weights.shape[1]
    scale = float(m.radius)
    q_pts = rs.randn(nq, 3).astype(np.float32) * scale
    s_pts = rs.randn(ns, 3).astype(np.float32) * scale
    x = rs.randn(ns, cin).astype(np.float32)
    inds = rs.randint(0, ns + 1, size=(nq, k)).astype(np.int64)  # incl. sentinel

    with torch.no_grad():
        out_t = m(torch.from_numpy(q_pts), torch.from_numpy(s_pts),
                  torch.from_numpy(inds), torch.from_numpy(x)).numpy()

    from diffreg_tpu.ops.kpconv import kpconv

    out_j = np.asarray(kpconv(
        jnp.asarray(q_pts), jnp.asarray(s_pts), jnp.asarray(inds.astype(np.int32)),
        jnp.asarray(x), jnp.asarray(m.kernel_points.numpy()),
        jnp.asarray(m.weights.detach().numpy()), float(m.KP_extent)))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


def test_attention_layer_parity(ref):
    """GeometryAttentionLayer (rotary) torch vs flax with converted weights;
    only valid-query rows compared (invalid rows are garbage in both)."""
    pipe, _, _, params_flat, _ = ref
    from diffreg_tpu.nn.transformer import GeometryAttentionLayer

    d, h = 432, 4
    b, n, s = 2, 24, 30
    rs = np.random.RandomState(5)
    x = rs.randn(b, n, d).astype(np.float32)
    src = rs.randn(b, s, d).astype(np.float32)
    theta_q = rs.randn(b, n, d).astype(np.float32)
    theta_k = rs.randn(b, s, d).astype(np.float32)
    x_pe = np.stack([np.cos(theta_q), np.sin(theta_q)], axis=-1)
    s_pe = np.stack([np.cos(theta_k), np.sin(theta_k)], axis=-1)
    x_mask = np.ones((b, n), bool); x_mask[0, -5:] = False
    s_mask = np.ones((b, s), bool); s_mask[1, -7:] = False

    tl = pipe.coarse_transformer.layers[0]  # 'self' layer; generic signature
    with torch.no_grad():
        out_t = tl(torch.from_numpy(x), torch.from_numpy(src),
                   torch.from_numpy(x_pe), torch.from_numpy(s_pe),
                   torch.from_numpy(x_mask), torch.from_numpy(s_mask)).numpy()

    layer = GeometryAttentionLayer(d, h, "rotary", use_flash=False)
    prefix = "coarse_transformer/layer0_self/"
    params = {}
    for key in ("q_proj", "k_proj", "v_proj", "merge", "mlp0", "mlp1"):
        params[key] = {"kernel": jnp.asarray(params_flat[prefix + key + "/kernel"])}
    for key in ("norm1", "norm2"):
        params[key] = {"scale": jnp.asarray(params_flat[prefix + key + "/scale"]),
                       "bias": jnp.asarray(params_flat[prefix + key + "/bias"])}
    out_j = np.asarray(layer.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(src), jnp.asarray(x_pe),
        jnp.asarray(s_pe), jnp.asarray(x_mask), jnp.asarray(s_mask)))

    valid = x_mask
    np.testing.assert_allclose(out_j[valid], out_t[valid], rtol=2e-4, atol=2e-4)


def test_matcher_parity(ref):
    """Matching (sinkhorn) torch vs flax with converted weights: identical
    conf matrices incl. the src_proj-on-both-sides quirk (matching.py:173-174).

    The reference consumes UNPADDED tensors (eval B=1 has no padding); ours
    consumes padded tensors with masks. Padded marginal mass is excluded on
    our side (ops/sinkhorn.py), so the comparison is per-element against the
    reference on the valid slice — padding must be invisible.
    """
    pipe, _, _, params_flat, _ = ref
    from diffreg_tpu.nn.matching import Matching, MatchingConfig

    d = 432
    b, n, s = 2, 20, 26
    rs = np.random.RandomState(7)
    sf = rs.randn(b, n, d).astype(np.float32)
    tf = rs.randn(b, s, d).astype(np.float32)
    theta_q = rs.randn(b, n, d).astype(np.float32)
    theta_k = rs.randn(b, s, d).astype(np.float32)
    s_pe = np.stack([np.cos(theta_q), np.sin(theta_q)], axis=-1)
    t_pe = np.stack([np.cos(theta_k), np.sin(theta_k)], axis=-1)
    src_mask = np.ones((b, n), bool); src_mask[0, -4:] = False
    tgt_mask = np.ones((b, s), bool); tgt_mask[1, -6:] = False

    conf_t = np.zeros((b, n, s), np.float32)
    with torch.no_grad():
        for i in range(b):
            nv, sv = int(src_mask[i].sum()), int(tgt_mask[i].sum())
            ct, _ = pipe.coarse_matching(
                torch.from_numpy(sf[i:i + 1, :nv]), torch.from_numpy(tf[i:i + 1, :sv]),
                torch.from_numpy(s_pe[i:i + 1, :nv]), torch.from_numpy(t_pe[i:i + 1, :sv]),
                torch.ones(1, nv, dtype=torch.bool), torch.ones(1, sv, dtype=torch.bool),
                {}, pe_type="rotary")
            conf_t[i, :nv, :sv] = ct[0].numpy()

    matcher = Matching(MatchingConfig(feature_dim=d))
    params = {
        "src_proj": {"kernel": jnp.asarray(params_flat["coarse_matching/src_proj/kernel"])},
        "bin_score": jnp.asarray(params_flat["coarse_matching/bin_score"]).reshape(()),
    }
    conf_j, _ = matcher.apply(
        {"params": params}, jnp.asarray(sf), jnp.asarray(tf), jnp.asarray(s_pe),
        jnp.asarray(t_pe), jnp.asarray(src_mask), jnp.asarray(tgt_mask),
        pe_type="rotary")
    conf_j = np.asarray(conf_j)

    valid = src_mask[:, :, None] & tgt_mask[:, None, :]
    np.testing.assert_allclose(conf_j[valid], conf_t[valid], rtol=1e-4, atol=1e-5)
