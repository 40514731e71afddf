"""Tests: PnP-RANSAC, circle loss, 2D-3D loss assembly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.engine.losses import LossConfig
from diffreg_tpu.engine.losses2d3d import (
    CircleLossConfig,
    circle_loss,
    normalized_feat_dists,
    overlap_masks,
)
from diffreg_tpu.eval.pnp import pnp_ransac
from diffreg_tpu.geometry import rotation_error_deg

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)


def _make_pnp_problem(rng, n=200, n_out=0, noise=0.0):
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([[0.1], [0.2], [2.5]], np.float32)
    pts = (rng.rand(n, 3).astype(np.float32) - 0.5) * 2
    cam = pts @ q.T + t.T
    u = cam[:, 0] / cam[:, 2] * 500 + 320
    v = cam[:, 1] / cam[:, 2] * 500 + 240
    pix = np.stack([u, v], 1).astype(np.float32) + rng.randn(n, 2) * noise
    if n_out:
        pix[:n_out] = rng.rand(n_out, 2) * np.array([640, 480])
    perm = rng.permutation(n)
    return pts[perm], pix[perm], q.astype(np.float32), t


class TestPnP:
    def test_clean(self, rng):
        pts, pix, q, t = _make_pnp_problem(rng)
        res = pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(pix),
                         jnp.ones(len(pts), bool), jnp.asarray(K), num_hypotheses=512)
        assert float(rotation_error_deg(res.rotation[None], jnp.asarray(q[None]))[0]) < 0.1
        assert bool(res.success)

    def test_outliers_and_noise(self, rng):
        pts, pix, q, t = _make_pnp_problem(rng, n=256, n_out=80, noise=0.5)
        res = pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(pix),
                         jnp.ones(len(pts), bool), jnp.asarray(K), num_hypotheses=2048)
        assert float(rotation_error_deg(res.rotation[None], jnp.asarray(q[None]))[0]) < 0.5
        assert int(res.inlier_count) >= 256 - 80 - 5

    def test_too_few_points_flags_failure(self, rng):
        pts, pix, q, t = _make_pnp_problem(rng, n=8)
        valid = np.zeros(8, bool)
        valid[:3] = True
        res = pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(pix),
                         jnp.asarray(valid), jnp.asarray(K), num_hypotheses=64)
        assert not bool(res.success)


class TestCircleLoss:
    def test_separating_features_lower_loss(self, rng):
        cfg = CircleLossConfig()
        n, m, c = 12, 12, 16
        # good features: matched pairs identical, others random
        f = rng.randn(n, c).astype(np.float32)
        good_a, good_b = f, f.copy()
        bad_b = rng.randn(m, c).astype(np.float32)
        pos = np.eye(n, dtype=bool)
        neg = ~pos

        d_good = normalized_feat_dists(jnp.asarray(good_a), jnp.asarray(good_b))
        d_bad = normalized_feat_dists(jnp.asarray(good_a), jnp.asarray(bad_b))
        l_good = float(circle_loss(d_good, jnp.asarray(pos), jnp.asarray(neg), cfg))
        l_bad = float(circle_loss(d_bad, jnp.asarray(pos), jnp.asarray(neg), cfg))
        assert l_good < l_bad

    def test_matches_torch_reference_impl(self, rng):
        import torch

        cfg = CircleLossConfig()
        n, m = 10, 9
        dists_np = (rng.rand(n, m) * 2).astype(np.float32)
        pos_np = rng.rand(n, m) > 0.7
        neg_np = (~pos_np) & (rng.rand(n, m) > 0.3)

        # independent torch transcription of the published circle-loss rules
        fd = torch.tensor(dists_np)
        pos = torch.tensor(pos_np)
        neg = torch.tensor(neg_np)
        row = (pos.sum(-1) > 0) & (neg.sum(-1) > 0)
        col = (pos.sum(-2) > 0) & (neg.sum(-2) > 0)
        pw = torch.clamp((fd - 1e5 * (~pos).float()) - cfg.positive_optimal, min=0)
        nw = torch.clamp(cfg.negative_optimal - (fd + 1e5 * (~neg).float()), min=0)
        lp_r = torch.logsumexp(cfg.log_scale * (fd - cfg.positive_margin) * pw, -1)
        lp_c = torch.logsumexp(cfg.log_scale * (fd - cfg.positive_margin) * pw, -2)
        ln_r = torch.logsumexp(cfg.log_scale * (cfg.negative_margin - fd) * nw, -1)
        ln_c = torch.logsumexp(cfg.log_scale * (cfg.negative_margin - fd) * nw, -2)
        lr = torch.nn.functional.softplus(lp_r + ln_r) / cfg.log_scale
        lc = torch.nn.functional.softplus(lp_c + ln_c) / cfg.log_scale
        ref = (lr[row].mean() + lc[col].mean()) / 2

        got = float(circle_loss(jnp.asarray(dists_np), jnp.asarray(pos_np),
                                jnp.asarray(neg_np), cfg))
        np.testing.assert_allclose(got, float(ref), rtol=1e-4)

    def test_overlap_masks(self):
        cfg = CircleLossConfig()
        ov = jnp.asarray(np.array([[0.5, 0.1], [0.25, 0.0]], np.float32))
        pos, neg, scales = overlap_masks(ov, cfg)
        assert bool(pos[0, 0]) and not bool(pos[0, 1])
        assert bool(neg[0, 1]) and bool(neg[1, 1])
        np.testing.assert_allclose(float(scales[0, 0]), np.sqrt(0.5), rtol=1e-5)


class TestFineLoss:
    def test_separating_features_lower_loss(self, rng):
        from diffreg_tpu.engine.losses2d3d import FineLossConfig, fine_matching_loss

        m, c = 24, 16
        pts = rng.rand(m, 3).astype(np.float32)
        pix = (rng.rand(m, 2) * 100).astype(np.float32)
        feats = rng.randn(m, c).astype(np.float32)
        valid = np.ones(m, bool)
        cfg = FineLossConfig()
        # matched pairs: identical geometry + identical features
        l_good, r_good = fine_matching_loss(
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pix),
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pix),
            jnp.asarray(valid), cfg)
        bad = rng.randn(m, c).astype(np.float32)
        l_bad, r_bad = fine_matching_loss(
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pix),
            jnp.asarray(bad), jnp.asarray(pts), jnp.asarray(pix),
            jnp.asarray(valid), cfg)
        assert float(l_good) < float(l_bad)
        assert float(r_good) == 1.0


class TestPatchInlierRatio:
    def test_pir_counts_gt_hits(self):
        from diffreg_tpu.engine.tester2d3d import patch_inlier_ratio

        n, m = 6, 6
        corr = jnp.zeros((n, m), bool).at[0, 0].set(True).at[1, 1].set(True).at[2, 5].set(True)
        gt_src = jnp.asarray(np.array([0, 1, 2, 0], np.int32))
        gt_tgt = jnp.asarray(np.array([0, 1, 2, 0], np.int32))
        gt_valid = jnp.asarray(np.array([True, True, True, False]))
        pir = patch_inlier_ratio(corr, gt_src, gt_tgt, gt_valid)
        assert float(pir) == pytest.approx(2 / 3)


@pytest.mark.slow
class TestTwoDThreeDTesterEndToEnd:
    def test_cache_and_eval_from_cache(self, tmp_path):
        """Inference -> per-scene npz cache -> eval_from_cache full metric
        table (reference test.py/eval.py split)."""
        import jax

        from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
        from diffreg_tpu.engine.tester2d3d import (Test2D3DConfig,
                                                   TwoDThreeDTester,
                                                   eval_from_cache)
        from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
        from diffreg_tpu.nn.matching import MatchingConfig
        from diffreg_tpu.nn.point_backbone import PointBackboneConfig

        cfg = Pipeline2D3DConfig(
            img_out_dim=16, img_base_dim=16,
            pcd_backbone=PointBackboneConfig(output_dim=16, init_dim=8,
                                             init_radius=0.1, init_sigma=0.08),
            hidden_dim=32, output_dim=32, num_heads=2,
            matching=MatchingConfig(feature_dim=32), sample_steps=1)
        model = DiffReg2D3D(cfg)
        key = jax.random.PRNGKey(0)
        batch = synthetic_2d3d_batch(batch_size=2, img_hw=(32, 48),
                                     n_points=160, seed=0)
        variables = model.init({"params": key}, batch, key, mode="train")

        def make_iter():
            for i in range(2):
                yield synthetic_2d3d_batch(batch_size=2, img_hw=(32, 48),
                                           n_points=160, seed=i), \
                    [f"scene{i % 2}", f"scene{(i + 1) % 2}"]

        tcfg = Test2D3DConfig(max_fine_corr=256, pnp_hypotheses=512)
        tester = TwoDThreeDTester(model, variables, tcfg)
        cache = str(tmp_path / "cache")
        summary = tester.test(make_iter, cache_dir=cache)
        for k in ("IR", "PIR", "FMR", "RR", "PMR>0", "PMR>=0.3", "pairs"):
            assert k in summary
        assert summary["pairs"] == 4

        ev = eval_from_cache(cache, tcfg)
        assert set(ev["scenes"]) == {"scene0", "scene1"}
        for k in ("PIR", "PMR>0", "PMR>=0.1", "PMR>=0.3", "PMR>=0.5",
                  "IR", "OR", "FMR", "RR"):
            assert k in ev, k
