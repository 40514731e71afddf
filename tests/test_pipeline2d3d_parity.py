"""MATR2D3D whole-forward numeric parity vs the reference torch model.

VERDICT r2 item 2: the 2D-3D trainable path (fusion, coarse matcher, patch
centers, GT machinery, diffusion branch) was shape-tested but never
value-tested against /root/reference/Diff-Reg-2d3d/experiments/
2d3dmatr.rgbdv2.stage4.level3.stage1/model.py:283-822. Here both models get
the SAME pair (built by our collate, converted to the reference pack-mode
data_dict), the SAME tower fixtures (fixed random dino map + monocular
depth — the frozen towers are parity-tested separately in
test_tower_conversion.py), and the reference's trainable weights converted
into our variables (tools/convert_checkpoint_2d3d.py).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo/tests")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

H, W = 126, 168          # 14 | H,W : coarse grid 9x12
H14, W14 = H // 14, W // 14


def _make_raw(seed=21, n_points=2800):
    """Synthetic raw pair in the dataset-reader schema."""
    rng = np.random.RandomState(seed)
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    intrinsics = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    base = rng.rand(H // 14, W // 14).astype(np.float32)
    depth = np.kron(base, np.ones((14, 14), np.float32)) * 1.2 + 0.8
    image_gray = (depth - depth.min()) / (np.ptp(depth) + 1e-6)
    image_rgb = np.stack([image_gray] * 3, axis=-1)

    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    z = depth.reshape(-1)
    cam = np.stack([(uu.reshape(-1) - cx) * z / fx,
                    (vv.reshape(-1) - cy) * z / fy, z], -1).astype(np.float32)

    sel = rng.permutation(H * W)[:n_points]
    from diffreg_tpu.data.synthetic import random_rotation

    rot = random_rotation(rng)
    trn = rng.randn(3, 1).astype(np.float32) * 0.2
    world = (cam[sel] - trn.T) @ rot
    tfm = np.eye(4, dtype=np.float32)
    tfm[:3, :3] = rot
    tfm[:3, 3] = trn[:, 0]

    return {
        "points": world.astype(np.float32),
        "depth": depth,
        "intrinsics": intrinsics,
        "transform": tfm,
        "image": image_rgb,
        "image_gray": image_gray,
        "feats": np.ones((n_points, 1), np.float32),
    }


@pytest.fixture(scope="module")
def fixtures():
    from convert_checkpoint_2d3d import DEAD_PREFIXES, DEAD_SUFFIXES, \
        convert_state_dict_2d3d, graft_2d3d
    from reference_utils2d3d import (
        load_reference_matr2d3d,
        sample_to_reference_data_2d3d,
        set_tower_fixtures,
    )
    from diffreg_tpu.data.collate2d3d import Spec2D3D, batch_2d3d, build_2d3d_sample
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig

    rng = np.random.RandomState(3)
    raw = _make_raw()
    dino = rng.randn(1, H14, W14, 1024).astype(np.float32) * 0.05
    mono = (rng.rand(H, W).astype(np.float32) * 150.0 + 60.0)
    set_tower_fixtures(dino, mono)

    spec = Spec2D3D(n_points=(3072, 1536, 768))
    sample = build_2d3d_sample(raw, spec, coarse_stride=14)
    sample["dino_feats"] = dino[0]
    sample["mono_depth"] = mono
    batch = batch_2d3d([sample])
    data = sample_to_reference_data_2d3d(sample, raw)

    ref_model, ref_cfg, ref_mod = load_reference_matr2d3d(sample_step=2)
    ref_model.img_h_c, ref_model.img_w_c = H14, W14

    sd = {k: v for k, v in ref_model.state_dict().items()
          if not k.startswith(DEAD_PREFIXES) and not k.endswith(DEAD_SUFFIXES)}
    params_flat, buffers_flat = convert_state_dict_2d3d(sd)

    cfg = Pipeline2D3DConfig(
        use_dino=True, use_mono_depth=True, coarse_stride=14,
        pcd_backbone=PointBackboneConfig(output_dim=128, init_dim=64),
        matching=MatchingConfig(feature_dim=256), sample_steps=2,
        procrustes_max_condition=200.0)
    model = DiffReg2D3D(cfg)
    jrng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda b, r: model.init({"params": r}, b, r, mode="train"), batch, jrng)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    variables = graft_2d3d(variables, params_flat, buffers_flat)

    return ref_model, ref_mod, raw, sample, batch, data, model, variables


def _ref_eval_forward(ref_model, data, x0):
    from reference_utils import patched_ddim_noise
    from reference_utils2d3d import torch_cpu_cuda_patch

    d = dict(data)
    ref_model.train(False)
    with torch.no_grad(), torch_cpu_cuda_patch(), patched_ddim_noise(x0):
        return ref_model.forward(d)


@pytest.fixture(scope="module")
def ref_eval(fixtures):
    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    ns = int(np.asarray(batch.masks[2][0]).sum())
    rs = np.random.RandomState(5)
    x0 = rs.randn(1, ns, H14 * W14).astype(np.float32)
    out = _ref_eval_forward(ref_model, data, x0)
    return out, x0, ns


def test_conversion_is_key_complete(fixtures):
    """Every trainable reference tensor (sans towers/dead) lands in our tree
    — graft_2d3d raises otherwise, so constructing the fixture proves it;
    here we only sanity-check the count."""
    ref_model, *_ , model, variables = fixtures
    n_ours = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
    assert n_ours > 10_000_000  # ~24M trainable params land


def test_single_pass_conf_parity(fixtures, ref_eval):
    """Towers-in -> backbones -> fusion -> coarse matcher: the single-pass
    conf matrix (model.py:548, stored as output_dict['conf_matrix_pred'])."""
    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    out_t, x0, ns = ref_eval

    out_j = model.apply(variables, batch, jax.random.PRNGKey(0), mode="backbone")
    conf_j = np.asarray(out_j["conf_matrix_pred"])[0, :ns]
    conf_t = out_t["conf_matrix_pred"][0].numpy()
    np.testing.assert_allclose(conf_j, conf_t, atol=1e-4, rtol=5e-3)


def test_fused_feature_parity(fixtures, ref_eval):
    """Normalized post-fusion coarse features (output_dict img/pcd_feats_c)."""
    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    out_t, x0, ns = ref_eval

    out_j = model.apply(variables, batch, jax.random.PRNGKey(0), mode="backbone")

    def norm(x):
        return x / np.clip(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8, None)

    img_j = norm(np.asarray(out_j["img_feats_c"])[0])
    pcd_j = norm(np.asarray(out_j["pcd_feats_c"])[0, :ns])
    np.testing.assert_allclose(img_j, out_t["img_feats_c"].numpy(),
                               atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(pcd_j, out_t["pcd_feats_c"].numpy(),
                               atol=2e-3, rtol=5e-3)


def test_overlap_gt_parity(fixtures, ref_eval):
    """GT node<->patch overlap machinery: same pair set and min overlaps
    (our host twin in collate2d3d vs reference get_2d3d_node_correspondences)."""
    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    out_t, x0, ns = ref_eval

    ref_pairs = {}
    gt_img = out_t["gt_img_node_corr_indices"].numpy()
    gt_pcd = out_t["gt_pcd_node_corr_indices"].numpy()
    gt_min = out_t["gt_node_corr_min_overlaps"].numpy()
    for i, j, m in zip(gt_pcd.tolist(), gt_img.tolist(), gt_min.tolist()):
        ref_pairs[(i, j)] = m

    ours = {}
    ov_val = np.asarray(batch.ov_valid[0])
    for i, j, m in zip(np.asarray(batch.ov_src[0])[ov_val].tolist(),
                       np.asarray(batch.ov_tgt[0])[ov_val].tolist(),
                       np.asarray(batch.ov_min[0])[ov_val].tolist()):
        ours[(i, j)] = m

    sym = set(ref_pairs) ^ set(ours)
    assert len(sym) <= max(2, len(ref_pairs) // 50), \
        f"overlap pair sets differ by {len(sym)} of {len(ref_pairs)}"
    common = set(ref_pairs) & set(ours)
    diffs = [abs(ref_pairs[p] - ours[p]) for p in common]
    assert np.max(diffs) < 0.05, f"min-overlap values differ up to {np.max(diffs)}"


def test_ddim_trajectory_parity(fixtures, ref_eval):
    """Full DDIM branch (2 steps, warp-active vs DA centers incl. the
    condition-gate decision at each step) -> final Sinkhorn conf
    (model.py:637-694).

    With the fixture's untrained weights the final conf is nearly FLAT
    (~1.4e-3 everywhere), so raw top-1 match sets are tie-breaking noise,
    not a parity signal. The sharp assertions are (a) the conf matrix
    itself and (b) argmax agreement on every row/column whose top-2 margin
    exceeds the numeric noise floor."""
    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    out_t, x0, ns = ref_eval

    x_pad = np.zeros((1, batch.masks[2].shape[1], H14 * W14), np.float32)
    x_pad[:, :ns] = x0
    out_j = model.apply(variables, batch, jax.random.PRNGKey(0), mode="ddim",
                        x_init=jnp.asarray(x_pad))
    conf_j = np.asarray(out_j["conf_matrix_pred"])[0, :ns]
    conf_t = out_t["conf_matrix_pred"][0].numpy()
    d = np.abs(conf_j - conf_t)
    assert d.max() < 2e-4, f"final DDIM conf diverged: max diff {d.max()}"

    # decisive rows/cols must pick the same partner (reference extracts the
    # match set with an unmasked mutual top-1 union, model.py:694)
    margin = 4.0 * max(float(d.max()), 1e-7)
    for axis in (1, 0):
        top = np.sort(conf_t, axis=axis)
        gap = np.take(top, -1, axis=axis) - np.take(top, -2, axis=axis)
        decisive = gap > margin
        am_t = conf_t.argmax(axis=axis)
        am_j = conf_j.argmax(axis=axis)
        agree = (am_t == am_j) | ~decisive
        assert agree.all(), (
            f"axis {axis}: {int((~agree).sum())} decisive argmaxes disagree "
            f"(of {int(decisive.sum())} decisive)")


def test_escalated_gt_parity(fixtures):
    """Our collate-time escalated coarse GT vs the reference's in-forward
    escalation ladder (model.py:564-597). Kabsch-vs-softProcrustes pose
    validation and f32 center coords make the radius boundary fuzzy, so a
    small symmetric difference is tolerated (same policy as the overlap
    test); exact-equality parity for everything downstream of the GT is
    covered by test_train_branch_parity's pair injection."""
    from reference_utils2d3d import torch_cpu_cuda_patch

    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures

    d = dict(data)
    ref_model.train(True)
    try:
        with torch.no_grad(), torch_cpu_cuda_patch():
            out_t = ref_model.forward(d)
    finally:
        ref_model.train(False)

    matrix_gt_t = out_t["matrix_gt"][0].numpy()
    theirs = set(map(tuple, np.argwhere(matrix_gt_t > 0.5)))
    gv = np.asarray(batch.gt_valid[0])
    ours = set(zip(np.asarray(batch.gt_src[0])[gv].tolist(),
                   np.asarray(batch.gt_tgt[0])[gv].tolist()))
    sym = ours ^ theirs
    assert len(sym) <= max(3, len(theirs) // 20), \
        f"escalated GT pair sets differ by {len(sym)} of {len(theirs)}"


def test_train_branch_parity(fixtures):
    """Training diffusion branch on a FIXED (ts, noise): the 3D-3D warp and
    conf_matrix_gt_hat (model.py:564-633). The reference's escalation loop is
    fed OUR escalated GT pairs (get_correspondences patched) so both sides
    disturb the identical matrix_gt — raw GT-set parity is asserted
    separately in test_escalated_gt_parity."""
    from reference_utils2d3d import torch_cpu_cuda_patch

    ref_model, ref_mod, raw, sample, batch, data, model, variables = fixtures
    ns = int(np.asarray(batch.masks[2][0]).sum())
    nt = H14 * W14
    rs = np.random.RandomState(11)
    noise = rs.randn(1, ns, nt).astype(np.float32)
    t_fix = 617

    gv = np.asarray(batch.gt_valid[0])
    our_pairs = np.stack([np.asarray(batch.gt_src[0])[gv],
                          np.asarray(batch.gt_tgt[0])[gv]], axis=1)
    orig_corr = ref_mod.get_correspondences
    ref_mod.get_correspondences = \
        lambda *a, **kw: torch.from_numpy(our_pairs.astype(np.int64))

    orig_randn, orig_randint = torch.randn, torch.randint

    def randn(*args, **kw):
        shape = args[0] if len(args) == 1 and isinstance(args[0], (tuple, torch.Size)) \
            else args
        if tuple(shape) == (1, ns, nt):
            return torch.from_numpy(noise)
        return orig_randn(*args, **kw)

    def randint(low, high, size, **kw):
        return torch.full(size, t_fix, dtype=torch.long)

    d = dict(data)
    ref_model.train(True)
    try:
        torch.randn, torch.randint = randn, randint
        with torch.no_grad(), torch_cpu_cuda_patch():
            out_t = ref_model.forward(d)
    finally:
        torch.randn, torch.randint = orig_randn, orig_randint
        ref_mod.get_correspondences = orig_corr
        ref_model.train(False)

    matrix_gt_t = out_t["matrix_gt"][0].numpy()
    gt_hat_t = out_t["conf_matrix_gt_hat"][0].numpy()

    # ours: same disturbed matrix through the module methods
    from diffreg_tpu.diffusion.schedule import q_sample

    def probe(mdl, b):
        enc = mdl._encode(b)
        hc, wc = enc["hc"], enc["wc"]
        nodes = b.points[-1]
        from diffreg_tpu.ops.partition import point_to_node_partition

        part = jax.vmap(lambda pf, nd, pv, nv: point_to_node_partition(
            pf, nd, pv, nv, mdl.cfg.pcd_num_points_in_patch))(
            b.points[0], nodes, b.masks[0], b.masks[-1])
        node_masks = part.node_masks & (part.node_sizes > mdl.cfg.pcd_min_node_size)
        real_c, c_valid, da_c, da_valid = mdl._patch_centers(b, hc, wc)

        matrix_gt = jnp.zeros((1, node_masks.shape[1], hc * wc))
        gs, gt_, gv = b.gt_src[0], b.gt_tgt[0], b.gt_valid[0]
        matrix_gt = matrix_gt.at[0, jnp.where(gv, gs, node_masks.shape[1] - 1),
                                 jnp.where(gv, gt_, hc * wc - 1)].set(
            jnp.where(gv, 1.0, matrix_gt[0, jnp.where(gv, gs, 0), jnp.where(gv, gt_, 0)]))

        noise_pad = jnp.zeros((1, node_masks.shape[1], hc * wc))
        noise_pad = noise_pad.at[:, :ns].set(jnp.asarray(noise))
        ts = jnp.full((1,), t_fix, jnp.int32)
        disturbed = q_sample(mdl.schedule, matrix_gt, ts, noise_pad)
        warped = mdl._warp_nodes(disturbed, nodes, da_c, node_masks, da_valid,
                                 node_pad=b.masks[-1])
        conf = mdl._denoise(enc, b, warped, node_masks, c_valid)
        return matrix_gt, warped, conf

    matrix_gt_j, warped_j, gt_hat_j = model.apply(variables, batch, method=probe)
    np.testing.assert_array_equal(
        np.asarray(matrix_gt_j)[0, :ns], matrix_gt_t)
    np.testing.assert_allclose(np.asarray(gt_hat_j)[0, :ns], gt_hat_t,
                               atol=1e-4, rtol=5e-3)
