"""WHOLE-pipeline numeric parity vs the reference torch Pipeline.

The conversion tests (test_checkpoint_conversion.py) prove per-module parity;
these tests prove the *composed* system matches: encode -> split -> coarse
transformer+matcher -> noised-matrix warp -> denoise, and the full DDIM loop,
on the SAME weights and the SAME pair (VERDICT r2 item 1).

Input identity is guaranteed by construction: one pair is built by OUR
pyramid builder and converted to the reference's packed data dict
(reference_utils.sample_to_reference_data), so both models consume literally
identical neighbor/pool/upsample tables. Any divergence is model
composition, not data.

Covered per branch (3dmatch / 4dmatch):
  * coarse features after split          (pipeline.py:169-177)
  * conf_matrix_pred                     (pipeline.py:184-190)
  * noised-matrix warp + conf_gt_hat     (pipeline.py:204-216, 293-309)
  * 2 DDIM steps -> conf, match set, R,t (pipeline.py:221-284)
with the identity-warp test config (gate 0) AND a warp-active gate for the
3dmatch denoise branch. Tolerances are loose-ish (1e-3) where the reference
runs its SVD on host CPU in float64 and we run Horn-eigh in f32 on device.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo/tests")

torch = pytest.importorskip("torch")

from convert_checkpoint import convert_state_dict, graft_into_variables

pytestmark = pytest.mark.slow


# --------------------------------------------------------------------- #
# fixtures
# --------------------------------------------------------------------- #

def _build_pair(variant: str, seed: int = 11):
    """One synthetic pair through OUR pyramid builder at reference scales."""
    from diffreg_tpu.data.batch import ShapeSpec
    from diffreg_tpu.data.pyramid import PyramidConfig, build_pair_pyramid, batch_from_samples
    from diffreg_tpu.data.synthetic import make_pair

    rng = np.random.RandomState(seed)
    src, tgt, rot, trn, _ = make_pair(rng, n_points=300, overlap=0.85, noise=0.002)
    if variant == "4dmatch":
        cfg = PyramidConfig(first_subsampling_dl=0.01, coarse_match_radius=0.024)
    else:
        cfg = PyramidConfig(first_subsampling_dl=0.025, coarse_match_radius=0.06)
    spec = ShapeSpec(
        n_points=(704, 704, 704, 704),
        k_neighbors=(24, 24, 24, 24),
        k_pools=(24, 24, 24),
        k_upsamples=(4, 4, 4),
        n_src=352, n_tgt=352, n_gt_matches=256,
    )
    sample = build_pair_pyramid(src, tgt, rot, trn, cfg, spec)
    batch = batch_from_samples([sample])
    return sample, batch


def _flax_model_with_ref_weights(variant, sd, batch, gate=None, sample_steps=2):
    """Build our model (flash off for CPU) and graft the converted torch
    state_dict into it."""
    import dataclasses

    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import KPFCN_ARCHITECTURE, preset_3dmatch, preset_4dmatch

    cfg = (preset_3dmatch(sample_steps=sample_steps) if variant == "3dmatch"
           else preset_4dmatch(sample_steps=sample_steps))
    if gate is not None:
        pro = dataclasses.replace(cfg.procrustes, max_condition_num=float(gate))
        tf = dataclasses.replace(cfg.coarse_transformer, procrustes=pro,
                                 flash_attention=False)
        cfg = dataclasses.replace(cfg, procrustes=pro, coarse_transformer=tf)
    else:
        tf = dataclasses.replace(cfg.coarse_transformer, flash_attention=False)
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    model = DiffusionMatchingModel(cfg)

    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda b, r: model.init({"params": r}, b, r, mode="train"), batch, rng)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    params_flat, buffers_flat = convert_state_dict(sd, KPFCN_ARCHITECTURE)
    variables, _ = graft_into_variables(variables, params_flat, buffers_flat)
    return model, variables


@pytest.fixture(scope="module")
def ref3d():
    from reference_utils import load_reference_pipeline, sample_to_reference_data

    def ovr(cfg):
        cfg.SAMPLE_STEP = 2

    pipe, config = load_reference_pipeline(branch="3dmatch", overrides=ovr)
    sample, batch = _build_pair("3dmatch")
    data = sample_to_reference_data(sample)
    model, variables = _flax_model_with_ref_weights("3dmatch", pipe.state_dict(), batch)
    return pipe, sample, batch, data, model, variables


@pytest.fixture(scope="module")
def ref4d():
    from reference_utils import load_reference_pipeline, sample_to_reference_data

    def ovr(cfg):
        cfg.SAMPLE_STEP = 2

    pipe, config = load_reference_pipeline(branch="4dmatch", overrides=ovr)
    sample, batch = _build_pair("4dmatch")
    data = sample_to_reference_data(sample)
    model, variables = _flax_model_with_ref_weights("4dmatch", pipe.state_dict(), batch)
    return pipe, sample, batch, data, model, variables


def _sizes(sample):
    return int(sample["src_mask"].sum()), int(sample["tgt_mask"].sum())


def _ref_split(pipe, data):
    with torch.no_grad():
        coarse = pipe.backbone(data, phase="coarse")
        return pipe.split_feats(coarse, data)


# --------------------------------------------------------------------- #
# 3DMatch branch
# --------------------------------------------------------------------- #

def test_encode_split_parity_3d(ref3d):
    """Backbone + split: composed KPFCN (17 blocks incl. norms/skips) and the
    padded-scatter split match the reference (pipeline.py:169-177)."""
    pipe, sample, batch, data, model, variables = ref3d
    ns, nt = _sizes(sample)

    sf_t, tf_t, sp_t, tp_t, _, _ = _ref_split(pipe, data)

    sf, tf, sp, tp = model.apply(variables, batch,
                                 method=lambda mdl, b: mdl.encode(b))
    np.testing.assert_allclose(np.asarray(sp)[0, :ns], sp_t[0].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tp)[0, :nt], tp_t[0].numpy(), atol=1e-6)
    scale = np.abs(sf_t.numpy()).mean()
    np.testing.assert_allclose(np.asarray(sf)[0, :ns], sf_t[0].numpy(),
                               atol=1e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(tf)[0, :nt], tf_t[0].numpy(),
                               atol=1e-3 * scale, rtol=2e-3)


def test_coarse_branch_parity_3d(ref3d):
    """Coarse transformer (incl. the positioning layer) + matcher + procrustes
    == reference training-branch head (pipeline.py:184-196)."""
    pipe, sample, batch, data, model, variables = ref3d
    ns, nt = _sizes(sample)

    sf_t, tf_t, sp_t, tp_t, sm_t, tm_t = _ref_split(pipe, data)
    with torch.no_grad():
        s2, t2, spe, tpe = pipe.coarse_transformer(
            sf_t, tf_t, sp_t, tp_t, sm_t, tm_t, dict(data))
        conf_t, _ = pipe.coarse_matching(
            s2, t2, spe, tpe, sm_t, tm_t, dict(data), pe_type=pipe.pe_type)
        r_t, t_t, *_ = pipe.soft_procrustes(conf_t, sp_t, tp_t, sm_t, tm_t)

    from diffreg_tpu.geometry.procrustes import soft_procrustes

    def probe(mdl, b, rng):
        sfb, tfb, sp, tp = mdl.encode(b)
        sf, tf, spe, tpe, _ = mdl.coarse_transformer(
            sfb, tfb, sp, tp, b.src_mask, b.tgt_mask,
            rot_gt=b.rot_gt, trn_gt=b.trn_gt, rng=rng)
        conf, _ = mdl.coarse_matching(
            sf, tf, spe, tpe, b.src_mask, b.tgt_mask,
            pe_type=mdl.cfg.coarse_transformer.pe_type)
        res = soft_procrustes(
            conf, sp, tp, b.src_mask, b.tgt_mask,
            sample_rate=mdl.cfg.procrustes.sample_rate,
            max_condition_num=mdl.cfg.procrustes.max_condition_num,
            use_masked_lengths=mdl.cfg.procrustes.use_masked_lengths)
        return conf, res.rotation, res.translation

    conf, r, t = model.apply(variables, batch, jax.random.PRNGKey(0), method=probe)
    np.testing.assert_allclose(np.asarray(conf)[0, :ns, :nt], conf_t[0].numpy(),
                               atol=2e-5, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(r)[0], r_t[0].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t)[0], t_t[0].numpy(), atol=5e-3)


@pytest.mark.parametrize("gate", [0.0, 200.0])
def test_denoise_branch_parity_3d(ref3d, gate):
    """Noised-matrix warp + denoising transformer + matcher on a FIXED
    disturbed matrix == reference train-branch tail (pipeline.py:212-216).
    gate=0 is the test config (identity warp, our static shortcut); gate=200
    is the train config where the Sinkhorn+Procrustes warp is live."""
    pipe, sample, batch, data, model, variables = ref3d
    ns, nt = _sizes(sample)
    rs = np.random.RandomState(3)
    disturbed = np.abs(rs.randn(1, ns, nt)).astype(np.float32) * 0.7

    pipe.soft_procrustes.max_condition_num = gate
    pipe.denoising_soft_procrustes.max_condition_num = gate
    try:
        sf_t, tf_t, sp_t, tp_t, sm_t, tm_t = _ref_split(pipe, data)
        with torch.no_grad():
            d_t = torch.from_numpy(disturbed.copy())  # masked_fill_ mutates
            src_w, tgt_w = pipe.get_warped_from_noising_matching(
                sp_t, tp_t, sm_t, tm_t, d_t)
            sfn, tfn, spe, tpe = pipe.denoising_transformer(
                sf_t, tf_t, src_w, tgt_w, sm_t, tm_t, dict(data))
            gt_hat_t, _ = pipe.denoising_coarse_matching(
                sfn, tfn, spe, tpe, sm_t, tm_t, dict(data), pe_type=pipe.pe_type)
    finally:
        pipe.soft_procrustes.max_condition_num = 0
        pipe.denoising_soft_procrustes.max_condition_num = 0

    model_g, variables_g = (model, variables) if gate == 0.0 else \
        _flax_model_with_ref_weights("3dmatch", pipe.state_dict(), batch, gate=gate)

    d_pad = np.zeros((1, batch.src_mask.shape[1], batch.tgt_mask.shape[1]), np.float32)
    d_pad[:, :ns, :nt] = disturbed

    def probe(mdl, b, d):
        sfb, tfb, sp, tp = mdl.encode(b)
        src_w, tp_w, _, _ = mdl._warp_from_noisy_matrix(
            d, sp, tp, b.src_mask, b.tgt_mask)
        conf, _ = mdl._denoise(sfb, tfb, src_w, tp_w, b.src_mask, b.tgt_mask)
        return src_w, conf

    src_w_j, gt_hat = model_g.apply(variables_g, batch, jnp.asarray(d_pad), method=probe)
    np.testing.assert_allclose(np.asarray(src_w_j)[0, :ns], src_w[0].numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(gt_hat)[0, :ns, :nt], gt_hat_t[0].numpy(),
                               atol=2e-5, rtol=2e-3)


def test_ddim_forward_parity_3d(ref3d):
    """Full eval forward, 2 DDIM steps: conf_matrix_pred, the top-1-union
    match set, and the final (R, t) match the reference DDIM branch
    (pipeline.py:221-284) from the same x init."""
    from reference_utils import patched_ddim_noise, torch_cpu_cuda_patch

    pipe, sample, batch, data, model, variables = ref3d
    ns, nt = _sizes(sample)
    rs = np.random.RandomState(5)
    x0 = rs.randn(1, ns, nt).astype(np.float32)

    d = dict(data)
    pipe.train(False)
    with torch.no_grad(), torch_cpu_cuda_patch(), patched_ddim_noise(x0):
        out = pipe.forward(d, eval_flag=False)
    conf_t = out["conf_matrix_pred"][0].numpy()
    match_t = out["match_pred"].numpy()
    # REFERENCE BUG: the float64 schedule buffers promote x (and hence the
    # final conf matrix) to float64; batch_weighted_procrustes then mixes a
    # float32 R with float64 means, raises, and the bare except returns
    # IDENTITY (procrustes.py:43,79-84) — out["R_s2t_pred"] is always eye(3)
    # on the eval branch. The reference metrics never consume it (RR comes
    # from RANSAC over match_pred); our model computes the pose correctly,
    # so compare against the un-crashed reference computation (conf in f32):
    assert np.allclose(out["R_s2t_pred"][0].numpy(), np.eye(3)), \
        "reference dtype bug fixed upstream? revisit this comparison"
    with torch.no_grad():
        r_ref, t_ref, *_ = pipe.soft_procrustes(
            out["conf_matrix_pred"].float(), d["s_pcd"], d["t_pcd"],
            d["src_mask"], d["tgt_mask"])
    r_t = r_ref[0].numpy()
    t_t = t_ref[0].numpy()

    x_pad = np.zeros((1, batch.src_mask.shape[1], batch.tgt_mask.shape[1]), np.float32)
    x_pad[:, :ns, :nt] = x0
    out_j = model.apply(variables, batch, jax.random.PRNGKey(0), mode="ddim",
                        x_init=jnp.asarray(x_pad))
    conf_j = np.asarray(out_j["conf_matrix_pred"])[0, :ns, :nt]
    np.testing.assert_allclose(conf_j, conf_t, atol=2e-5, rtol=2e-3)

    ours = set(map(tuple, np.argwhere(np.asarray(out_j["corr_mask"])[0, :ns, :nt])))
    theirs = set(zip(match_t[:, 1].tolist(), match_t[:, 2].tolist()))
    only = ours ^ theirs
    # threshold-crossing matches sit at ~1e-7 conf margins; torch's
    # intra-op thread partitioning (load-dependent) perturbs its side of
    # the comparison enough to flip a few (observed 0-4 of ~340 across
    # runs of the SAME code) — allow 2%
    assert len(only) <= max(5, len(theirs) // 50), (
        f"match sets differ by {len(only)} of {len(theirs)}")

    np.testing.assert_allclose(np.asarray(out_j["rotation_pred"])[0], r_t, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["translation_pred"])[0], t_t, atol=5e-3)


# --------------------------------------------------------------------- #
# 4DMatch branch
# --------------------------------------------------------------------- #

def test_encode_split_parity_4d(ref4d):
    pipe, sample, batch, data, model, variables = ref4d
    ns, nt = _sizes(sample)
    sf_t, tf_t, sp_t, tp_t, _, _ = _ref_split(pipe, data)
    sf, tf, sp, tp = model.apply(variables, batch,
                                 method=lambda mdl, b: mdl.encode(b))
    scale = np.abs(sf_t.numpy()).mean()
    np.testing.assert_allclose(np.asarray(sp)[0, :ns], sp_t[0].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf)[0, :ns], sf_t[0].numpy(),
                               atol=1e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(tf)[0, :nt], tf_t[0].numpy(),
                               atol=1e-3 * scale, rtol=2e-3)


def test_train_noise_model_parity_4d(ref4d):
    """4dmatch training noising: sigmoid(q_sample(gt)) (4d pipeline.py:143-145)
    == our schedule + sigmoid on the same gt/noise/t."""
    pipe, sample, batch, data, model, variables = ref4d
    ns, nt = _sizes(sample)
    rs = np.random.RandomState(7)
    gt = (rs.rand(1, ns, nt) < 0.01).astype(np.float32)
    noise = rs.randn(1, ns, nt).astype(np.float32)
    t = 513

    sys.path.insert(0, "/root/reference/Diff-Reg-4dmatch")
    from models.pipeline import q_sample as ref_q_sample  # loaded by fixture

    with torch.no_grad():
        ref = torch.sigmoid(ref_q_sample(
            torch.from_numpy(gt), torch.tensor([t]), noise=torch.from_numpy(noise)))

    from diffreg_tpu.diffusion.schedule import make_schedule, q_sample

    sched = make_schedule(1000)
    ours = jax.nn.sigmoid(q_sample(sched, jnp.asarray(gt), jnp.asarray([t]),
                                   jnp.asarray(noise)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-5)


def test_ddim_forward_parity_4d(ref4d):
    """4dmatch DDIM branch: warp-active (gate 40) loop, no per-step
    min-shift, final sigmoid head (4d pipeline.py:156-199); stochastic term
    zeroed identically on both sides."""
    from reference_utils import patched_ddim_noise, torch_cpu_cuda_patch

    pipe, sample, batch, data, model, variables = ref4d
    ns, nt = _sizes(sample)
    rs = np.random.RandomState(9)
    x0 = rs.randn(1, ns, nt).astype(np.float32)

    d = dict(data)
    pipe.train(False)
    with torch.no_grad(), torch_cpu_cuda_patch(), \
            patched_ddim_noise(x0, zero_randn_like=True):
        out = pipe.forward(d, eval_flag=False)
    conf_t = out["conf_matrix_pred"][0].numpy()
    # same reference dtype bug as the 3dmatch branch: R_s2t_pred is identity
    # (see test_ddim_forward_parity_3d); compare the un-crashed computation
    with torch.no_grad():
        r_ref, t_ref, *_ = pipe.soft_procrustes(
            out["conf_matrix_pred"].float(), d["s_pcd"], d["t_pcd"],
            d["src_mask"], d["tgt_mask"])
    r_t = r_ref[0].numpy()
    t_t = t_ref[0].numpy()

    x_pad = np.zeros((1, batch.src_mask.shape[1], batch.tgt_mask.shape[1]), np.float32)
    x_pad[:, :ns, :nt] = x0
    out_j = model.apply(variables, batch, jax.random.PRNGKey(0), mode="ddim",
                        x_init=jnp.asarray(x_pad), zero_ddim_noise=True)
    conf_j = np.asarray(out_j["conf_matrix_pred"])[0, :ns, :nt]
    np.testing.assert_allclose(conf_j, conf_t, atol=1e-4, rtol=2e-3)

    # The 4d head is sigmoid(x): a DENSE, near-uniform confidence matrix, so
    # the top-max(ns,nt) weight selection has thousands of near-ties within
    # fp noise — the selected support (and hence the pose) is ill-conditioned
    # w.r.t. 1e-5-level conf differences. Compare poses geodesically instead
    # of elementwise.
    r_j = np.asarray(out_j["rotation_pred"])[0]
    cos_angle = np.clip((np.trace(r_j.T @ r_t) - 1.0) / 2.0, -1.0, 1.0)
    angle_deg = np.degrees(np.arccos(cos_angle))
    assert angle_deg < 2.5, f"rotation differs by {angle_deg:.2f} deg"
    t_j = np.asarray(out_j["translation_pred"])[0]
    assert np.linalg.norm(t_j - t_t) < 0.06, f"translation differs by {np.linalg.norm(t_j - t_t):.4f}"
