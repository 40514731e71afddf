"""Loss-library twins cross-checked against independently written torch/numpy
formulas (same policy as test_ops_core.py — the torch expressions below are
re-derived from the published loss definitions, not from the reference)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from diffreg_tpu.engine import (
    as_rigid_as_possible_loss,
    chamfer_distance_loss,
    hardest_contrastive_loss,
    orthogonal_loss,
    sigmoid_focal_loss,
    sigmoid_focal_loss_with_logits,
    smooth_cross_entropy_loss,
    transformation_loss,
    weighted_bce_loss,
    weighted_bce_loss_with_logits,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _rand_rot(rng, b):
    q = rng.randn(b, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(b, 3, 3).astype(np.float32)


class TestChamfer:
    def test_unmasked_matches_bruteforce(self, rng):
        a = rng.randn(2, 30, 3).astype(np.float32)
        b = rng.randn(2, 40, 3).astype(np.float32)
        got = float(chamfer_distance_loss(jnp.asarray(a), jnp.asarray(b)))
        d = np.linalg.norm(a[:, :, None] - b[:, None, :], axis=-1)
        want = d.min(2).mean() + d.min(1).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mask_equals_cropped(self, rng):
        a = rng.randn(1, 30, 3).astype(np.float32)
        b = rng.randn(1, 40, 3).astype(np.float32)
        am = np.zeros((1, 30), bool); am[:, :17] = True
        bm = np.zeros((1, 40), bool); bm[:, :23] = True
        got = float(chamfer_distance_loss(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(am), jnp.asarray(bm)))
        want = float(chamfer_distance_loss(jnp.asarray(a[:, :17]),
                                           jnp.asarray(b[:, :23])))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_truncate_drops_outliers(self, rng):
        a = rng.rand(1, 20, 3).astype(np.float32)
        b = np.concatenate([a + 1e-3, np.full((1, 5, 3), 100.0, np.float32)], axis=1)
        full = float(chamfer_distance_loss(jnp.asarray(a), jnp.asarray(b)))
        trunc = float(chamfer_distance_loss(jnp.asarray(a), jnp.asarray(b), truncate=0.5))
        assert trunc < 0.1 < full


class TestFocalAndBCE:
    def test_focal_matches_torch(self, rng):
        p = rng.rand(6, 9).astype(np.float32) * 0.98 + 0.01
        t = (rng.rand(6, 9) > 0.5).astype(np.float32)
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(p), jnp.asarray(t),
                                            alpha=0.25, gamma=2.0))
        pt_, tt = torch.tensor(p), torch.tensor(t)
        ce = F.binary_cross_entropy(pt_, tt, reduction="none")
        p_t = pt_ * tt + (1 - pt_) * (1 - tt)
        want = (0.25 * tt + 0.75 * (1 - tt)) * ce * (1 - p_t) ** 2
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-6)

    def test_focal_logits_matches_torch(self, rng):
        x = rng.randn(6, 9).astype(np.float32) * 3
        t = (rng.rand(6, 9) > 0.5).astype(np.float32)
        got = np.asarray(sigmoid_focal_loss_with_logits(
            jnp.asarray(x), jnp.asarray(t), alpha=0.25, gamma=2.0, reduction="mean"))
        xt, tt = torch.tensor(x), torch.tensor(t)
        p = torch.sigmoid(xt)
        ce = F.binary_cross_entropy_with_logits(xt, tt, reduction="none")
        p_t = p * tt + (1 - p) * (1 - tt)
        want = ((0.25 * tt + 0.75 * (1 - tt)) * ce * (1 - p_t) ** 2).mean()
        np.testing.assert_allclose(got, float(want), rtol=1e-4)

    def test_weighted_bce_matches_torch(self, rng):
        p = rng.rand(5, 7).astype(np.float32) * 0.98 + 0.01
        t = (rng.rand(5, 7) > 0.7).astype(np.float32)
        got = float(weighted_bce_loss(jnp.asarray(p), jnp.asarray(t)))
        pt_, tt = torch.tensor(p), torch.tensor(t)
        neg_w = tt.mean()
        w = tt * (1 - neg_w) + (1 - tt) * neg_w
        want = (w * F.binary_cross_entropy(pt_, tt, reduction="none")).mean()
        np.testing.assert_allclose(got, float(want), rtol=1e-4)

    def test_weighted_bce_logits_matches_probs_path(self, rng):
        x = rng.randn(5, 7).astype(np.float32)
        t = (rng.rand(5, 7) > 0.5).astype(np.float32)
        a = float(weighted_bce_loss_with_logits(jnp.asarray(x), jnp.asarray(t)))
        b = float(weighted_bce_loss(jax.nn.sigmoid(jnp.asarray(x)), jnp.asarray(t)))
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_weighted_bce_gradient_ignores_weight(self, rng):
        # the class weights are stop-gradiented (reference .detach())
        x = jnp.asarray(rng.rand(4, 4).astype(np.float32) * 0.9 + 0.05)
        t = jnp.asarray((rng.rand(4, 4) > 0.5).astype(np.float32))
        g = jax.grad(lambda p: weighted_bce_loss(p, t))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestRotationLosses:
    def test_orthogonal_zero_at_identity(self, rng):
        r = _rand_rot(rng, 4)
        assert float(orthogonal_loss(jnp.asarray(r), jnp.asarray(r))) < 1e-10
        assert float(orthogonal_loss(jnp.asarray(np.eye(3, dtype=np.float32)[None]))) < 1e-12

    def test_transformation_loss_matches_torch(self, rng):
        re, rg = _rand_rot(rng, 3), _rand_rot(rng, 3)
        te = rng.randn(3, 3).astype(np.float32)
        tg = rng.randn(3, 3).astype(np.float32)
        loss, rl, tl = transformation_loss(jnp.asarray(re), jnp.asarray(te),
                                           jnp.asarray(rg), jnp.asarray(tg),
                                           weight_r=2.0, weight_t=0.5)
        eye = torch.eye(3).expand(3, 3, 3)
        want_r = F.mse_loss(torch.tensor(re).transpose(-1, -2) @ torch.tensor(rg), eye)
        want_t = F.mse_loss(torch.tensor(te), torch.tensor(tg))
        np.testing.assert_allclose(float(rl), float(want_r), rtol=1e-4)
        np.testing.assert_allclose(float(tl), float(want_t), rtol=1e-5)
        np.testing.assert_allclose(float(loss), 2.0 * float(want_r) + 0.5 * float(want_t), rtol=1e-4)


class TestSmoothCE:
    def test_matches_torch_formula(self, rng):
        x = rng.randn(2, 5, 11).astype(np.float32)
        t = rng.randint(0, 5, size=(2, 11))
        got = float(smooth_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t), eps=0.1))
        xt = torch.tensor(x)
        one_hot = F.one_hot(torch.tensor(t), 5).float().transpose(1, 2)
        smoothed = one_hot * 0.9 + 0.1 / 5
        want = -(smoothed * F.log_softmax(xt, dim=1)).sum(1).mean()
        np.testing.assert_allclose(got, float(want), rtol=1e-5)


class TestHardestContrastive:
    def test_separable_descriptors_zero_loss(self, rng):
        # positives identical, everything else far apart in feature space
        n = 8
        f0 = np.eye(n, dtype=np.float32) + 0.01 * rng.randn(n, n).astype(np.float32)
        f1 = f0.copy()
        pairs = np.stack([np.arange(4), np.arange(4)], axis=1)
        out = hardest_contrastive_loss(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pairs),
            jnp.ones(4, bool), pos_thresh=0.1, neg_thresh=1.2)
        # positives are ~identical -> pos_loss ~0; hardest valid negative is
        # far (features near-orthogonal, distance ~sqrt(2) > 1.2) -> zero
        assert float(out["pos_loss"]) < 1e-4
        assert float(out["loss"]) < 0.01

    def test_collapsed_descriptors_penalized(self, rng):
        f = np.ones((10, 4), np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        pairs = np.stack([np.arange(3), np.arange(3)], axis=1)
        out = hardest_contrastive_loss(
            jnp.asarray(f), jnp.asarray(f), jnp.asarray(pairs),
            jnp.ones(3, bool), pos_thresh=0.1, neg_thresh=1.4)
        # all negatives at distance 0 -> neg loss ~ neg_thresh^2
        assert float(out["neg_loss"]) > 1.5

    def test_padded_pair_aliasing_real_index(self, rng):
        # a padded (0, 0) row must NOT erase the real positive at (0, 0):
        # the hardest negative for anchor 0 must still exclude its positive
        f0 = rng.randn(8, 4).astype(np.float32)
        f1 = f0 + 0.001 * rng.randn(8, 4).astype(np.float32)
        pairs = np.array([[0, 0], [1, 1], [0, 0], [0, 0]])
        mask = np.array([True, True, False, False])   # padded rows alias (0,0)
        out = hardest_contrastive_loss(jnp.asarray(f0), jnp.asarray(f1),
                                       jnp.asarray(pairs), jnp.asarray(mask),
                                       0.1, 1.4)
        ref = hardest_contrastive_loss(jnp.asarray(f0), jnp.asarray(f1),
                                       jnp.asarray(pairs[:2]), jnp.ones(2, bool),
                                       0.1, 1.4)
        np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]), rtol=1e-5)

    def test_padded_pairs_ignored(self, rng):
        f0 = rng.randn(12, 6).astype(np.float32)
        f1 = rng.randn(12, 6).astype(np.float32)
        pairs = np.stack([np.arange(6), np.arange(6)], axis=1)
        mask = np.array([True] * 3 + [False] * 3)
        a = hardest_contrastive_loss(jnp.asarray(f0), jnp.asarray(f1),
                                     jnp.asarray(pairs), jnp.asarray(mask),
                                     0.1, 1.4)
        b = hardest_contrastive_loss(jnp.asarray(f0), jnp.asarray(f1),
                                     jnp.asarray(pairs[:3]), jnp.ones(3, bool),
                                     0.1, 1.4)
        np.testing.assert_allclose(float(a["loss"]), float(b["loss"]), rtol=1e-5)


class TestARAP:
    def test_zero_for_global_rigid_motion(self, rng):
        v = 12
        nodes = rng.randn(v, 3).astype(np.float32)
        r = _rand_rot(rng, 1)[0]
        t = rng.randn(3).astype(np.float32)
        # per-node transform = same global rotation; translations chosen so
        # each node maps to R n + t: trans_i = R n_i + t - n_i
        rots = np.tile(r[None], (v, 1, 1))
        trns = nodes @ r.T + t - nodes
        edges = np.stack([rng.randint(0, v, 30), rng.randint(0, v, 30)], axis=1)
        loss = float(as_rigid_as_possible_loss(
            jnp.asarray(nodes), jnp.asarray(rots), jnp.asarray(trns.astype(np.float32)),
            jnp.asarray(edges)))
        assert loss < 1e-8

    def test_bent_graph_nonzero_and_weighted(self, rng):
        v = 8
        nodes = rng.randn(v, 3).astype(np.float32)
        rots = np.tile(np.eye(3, dtype=np.float32)[None], (v, 1, 1))
        trns = rng.randn(v, 3).astype(np.float32)  # incoherent translations
        edges = np.stack([np.arange(v - 1), np.arange(1, v)], axis=1)
        full = float(as_rigid_as_possible_loss(
            jnp.asarray(nodes), jnp.asarray(rots), jnp.asarray(trns), jnp.asarray(edges)))
        assert full > 1e-3
        w = np.zeros(v - 1, np.float32)
        zero = float(as_rigid_as_possible_loss(
            jnp.asarray(nodes), jnp.asarray(rots), jnp.asarray(trns),
            jnp.asarray(edges), edge_weights=jnp.asarray(w)))
        assert zero == 0.0
