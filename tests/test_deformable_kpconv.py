"""Deformable/modulated KPConv vs the reference torch implementation.

The reference carries the full deformable-KPConv family
(Diff-Reg-3dmatch/models/blocks.py:124-345) even though no live config uses
it; these tests cross-check our static-shape twin (ops/kpconv.py
kpconv_deformable) value-for-value against the torch module, including the
running variables (min_d2 / deformed_KP) that feed the deformation
regularizer.
"""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _load_reference_kpconv():
    from reference_utils import REF_ROOTS, _purge_reference_modules

    torch = pytest.importorskip("torch")
    root = REF_ROOTS["3dmatch"]
    _purge_reference_modules()
    sys.path.insert(0, root)
    cwd = os.getcwd()
    os.chdir(root)  # kernel dispositions ply path is relative
    try:
        from models.blocks import KPConv
    finally:
        os.chdir(cwd)
    return torch, KPConv, root


def _random_problem(rng, nq=40, ns=50, k=12, cin=8):
    q_pts = rng.randn(nq, 3).astype(np.float32) * 0.3
    s_pts = rng.randn(ns, 3).astype(np.float32) * 0.3
    x = rng.randn(ns, cin).astype(np.float32)
    inds = rng.randint(0, ns, size=(nq, k)).astype(np.int64)
    # sentinel-pad some neighborhoods (index == ns -> shadow row)
    inds[rng.rand(nq, k) < 0.15] = ns
    return q_pts, s_pts, inds, x


@pytest.mark.slow
@pytest.mark.parametrize("modulated", [False, True])
@pytest.mark.parametrize("influence", ["linear", "gaussian"])
def test_deformable_kpconv_matches_reference(modulated, influence):
    torch, RefKPConv, root = _load_reference_kpconv()
    from diffreg_tpu.ops.kpconv import kpconv_deformable

    cin, cout, p = 8, 16, 15
    cwd = os.getcwd()
    os.chdir(root)
    try:
        torch.manual_seed(3)
        conv = RefKPConv(p, 3, cin, cout, KP_extent=0.35, radius=0.5,
                         KP_influence=influence, aggregation_mode="sum",
                         deformable=True, modulated=modulated).eval()
    finally:
        os.chdir(cwd)
    with torch.no_grad():
        # offset_bias initializes to zero — randomize so the deformation
        # path is genuinely exercised
        conv.offset_bias.normal_(0.0, 0.3)

    rng = np.random.RandomState(7)
    q_pts, s_pts, inds, x = _random_problem(rng)

    with torch.no_grad():
        out_ref = conv(torch.from_numpy(q_pts), torch.from_numpy(s_pts),
                       torch.from_numpy(inds), torch.from_numpy(x)).numpy()
        min_d2_ref = conv.min_d2.numpy()
        deformed_ref = conv.deformed_KP.numpy()

    out, aux = jax.jit(
        lambda *a: kpconv_deformable(*a[:-1], kp_extent=0.35,
                                     influence=influence, modulated=modulated,
                                     offset_kernel_points=a[-1]))(
        jnp.asarray(q_pts), jnp.asarray(s_pts), jnp.asarray(inds.astype(np.int32)),
        jnp.asarray(x), jnp.asarray(conv.kernel_points.detach().numpy()),
        jnp.asarray(conv.weights.detach().numpy()),
        jnp.asarray(conv.offset_conv.weights.detach().numpy()),
        jnp.asarray(conv.offset_bias.detach().numpy()),
        jnp.asarray(conv.offset_conv.kernel_points.detach().numpy()))

    np.testing.assert_allclose(np.asarray(aux["deformed_kp"]), deformed_ref,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(aux["min_d2"]), min_d2_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


@pytest.mark.slow
def test_p2p_fitting_regularizer_matches_reference_formula():
    """Our regularizer equals the KPConv point-to-point fitting loss the
    reference's running variables are stored for (blocks.py:154-157),
    computed here with torch on the same aux."""
    torch = pytest.importorskip("torch")
    from diffreg_tpu.engine import p2p_fitting_regularizer

    rng = np.random.RandomState(0)
    nq, p, extent, repulse = 30, 15, 0.35, 1.2
    min_d2 = (rng.rand(1, nq, p) * 0.1).astype(np.float32)
    deformed = (rng.randn(1, nq, p, 3) * 0.2).astype(np.float32)

    # torch formulation: fitting = l1(min_d2/extent^2, 0); repulsive per
    # kernel point vs detached others, clamped above at 0
    t_min = torch.from_numpy(min_d2[0])
    t_kp = torch.from_numpy(deformed[0]) / extent
    l1 = torch.nn.L1Loss()
    fitting = l1(t_min / extent**2, torch.zeros_like(t_min))
    repulsive = torch.zeros(())
    for i in range(p):
        other = torch.cat([t_kp[:, :i, :], t_kp[:, i + 1:, :]], dim=1).detach()
        dist = torch.sqrt(torch.sum((other - t_kp[:, i:i + 1, :]) ** 2, dim=2))
        rep = torch.sum(torch.clamp_max(dist - repulse, max=0.0) ** 2, dim=1)
        repulsive = repulsive + l1(rep, torch.zeros_like(rep)) / p
    expected = float(fitting + repulsive)

    inter = {"backbone": {"conv": {"deform_aux": ({
        "min_d2": jnp.asarray(min_d2),
        "deformed_kp": jnp.asarray(deformed),
        "kp_extent": jnp.asarray(extent, jnp.float32),
        "q_mask": jnp.ones((1, nq), bool),
    },)}}}
    got = float(p2p_fitting_regularizer(inter, repulse_extent=repulse))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # padded queries are excluded: duplicating rows under a False mask
    # must not change the value
    inter2 = {"deform_aux": ({
        "min_d2": jnp.concatenate([jnp.asarray(min_d2),
                                   jnp.full((1, nq, p), 1e6, jnp.float32)], 1),
        "deformed_kp": jnp.concatenate([jnp.asarray(deformed),
                                        jnp.zeros((1, nq, p, 3), jnp.float32)], 1),
        "kp_extent": jnp.asarray(extent, jnp.float32),
        "q_mask": jnp.concatenate([jnp.ones((1, nq), bool),
                                   jnp.zeros((1, nq), bool)], 1),
    },)}
    np.testing.assert_allclose(float(p2p_fitting_regularizer(
        inter2, repulse_extent=repulse)), expected, rtol=1e-5)


def test_deformable_kpfcn_blocks_sow_aux_and_train():
    """A KPFCN with deformable blocks runs, sows deform_aux, and the
    regularizer is differentiable wrt the offset parameters."""
    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine import p2p_fitting_regularizer
    from diffreg_tpu.nn.kpfcn import KPFCN, KPFCNConfig

    batch, _, _ = synthetic_batch(batch_size=1, n_points=96, seed=0)
    cfg = KPFCNConfig(
        architecture=("simple", "resnetb_deformable",
                      "resnetb_deformable_strided", "resnetb_deformable",
                      "nearest_upsample", "unary"),
        num_kernel_points=15, first_feats_dim=16, coarse_feature_dim=24,
        fine_feature_dim=16, coarse_level=-1, modulated=True)
    model = KPFCN(cfg)
    pyr = {"points": batch.points, "masks": batch.masks,
           "neighbors": batch.neighbors, "pools": batch.pools,
           "upsamples": batch.upsamples, "features": batch.features}
    variables = model.init(jax.random.PRNGKey(0), pyr, phase="coarse")
    # three deformable convs -> three offset param groups
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    n_offs = sum(1 for kp, _ in flat if "offset_weights" in str(kp))
    assert n_offs == 3

    def reg_loss(params):
        _, mut = model.apply(
            {"params": params, "buffers": variables["buffers"]}, pyr,
            phase="coarse", mutable=["intermediates"])
        return p2p_fitting_regularizer(mut["intermediates"],
                                       fitting_power=1.0)

    val, grads = jax.jit(jax.value_and_grad(reg_loss))(variables["params"])
    assert np.isfinite(float(val)) and float(val) > 0.0
    gflat = jax.tree_util.tree_flatten_with_path(grads)[0]
    goff = [np.abs(np.asarray(g)).max() for kp, g in gflat
            if "offset_weights" in str(kp)]
    assert len(goff) == 3 and all(np.isfinite(g) for g in goff)
    assert max(goff) > 0.0
