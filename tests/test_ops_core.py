"""Unit tests for the ops layer: Sinkhorn, PE, selection, subsample, neighbors, KPConv."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu import ops
from diffreg_tpu.geometry import soft_procrustes, weighted_kabsch, rotation_error_deg


def random_rigid(rng):
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3, 1) * 0.5
    return q, t


class TestSinkhorn:
    def test_marginals_unmasked(self, rng):
        scores = jnp.asarray(rng.randn(2, 7, 5).astype(np.float32))
        z = ops.log_sinkhorn(scores, 1.0, 50)
        p = np.asarray(jnp.exp(z))
        # After many iters the augmented matrix is (close to) doubly stochastic
        # under the reference marginals: each real row sums to 1.
        np.testing.assert_allclose(p[:, :-1, :].sum(-1), 1.0, atol=1e-3)
        np.testing.assert_allclose(p[:, :, :-1].sum(1), 1.0, atol=1e-3)

    def test_masked_rows_get_no_mass(self, rng):
        scores = jnp.asarray(rng.randn(1, 6, 6).astype(np.float32))
        src_mask = jnp.array([[1, 1, 1, 1, 0, 0]], bool)
        tgt_mask = jnp.array([[1, 1, 1, 0, 0, 0]], bool)
        conf = ops.sinkhorn_conf_matrix(scores, 1.0, 10, src_mask, tgt_mask)
        conf = np.asarray(conf)
        assert conf[0, 4:, :].max() < 1e-6
        assert conf[0, :, 3:].max() < 1e-6
        assert conf[0, :4, :3].max() > 1e-3

    def test_padding_invariance(self, rng):
        """Bucket padding must be invisible: masked sinkhorn over a padded
        matrix == unmasked sinkhorn over the unpadded matrix. This is the
        eval-B=1 reference semantic (matching.py:61-93 has no padding there);
        padded rows/cols must contribute zero marginal mass."""
        n, m, np_, mp_ = 6, 5, 11, 9
        scores = rng.randn(1, n, m).astype(np.float32)
        padded = np.zeros((1, np_, mp_), np.float32)
        padded[:, :n, :m] = scores
        src_mask = jnp.asarray(np.arange(np_)[None] < n)
        tgt_mask = jnp.asarray(np.arange(mp_)[None] < m)
        conf_ref = np.asarray(ops.sinkhorn_conf_matrix(jnp.asarray(scores), 1.0, 3))
        conf_pad = np.asarray(ops.sinkhorn_conf_matrix(
            jnp.asarray(padded), 1.0, 3, src_mask, tgt_mask))
        np.testing.assert_allclose(conf_pad[:, :n, :m], conf_ref, atol=1e-5)
        assert conf_pad[:, n:, :].max() < 1e-6
        assert conf_pad[:, :, m:].max() < 1e-6

    def test_matches_torch_reference_formula(self, rng):
        """Cross-check against an independent torch implementation of the
        same marginal scheme (written from the published SuperGlue OT rules,
        not copied)."""
        import torch

        b, n, m = 1, 5, 4
        scores_np = rng.randn(b, n, m).astype(np.float32)
        alpha = 0.7
        iters = 3

        # independent torch impl
        s = torch.tensor(scores_np)
        ms, ns = float(n), float(m)
        bins0 = torch.full((b, n, 1), alpha)
        bins1 = torch.full((b, 1, m), alpha)
        corner = torch.full((b, 1, 1), alpha)
        zt = torch.cat([torch.cat([s, bins0], -1), torch.cat([bins1, corner], -1)], 1)
        norm = -torch.log(torch.tensor(ms + ns))
        log_mu = torch.cat([norm.expand(n), (torch.log(torch.tensor(ns)) + norm).view(1)]).expand(b, -1)
        log_nu = torch.cat([norm.expand(m), (torch.log(torch.tensor(ms)) + norm).view(1)]).expand(b, -1)
        u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
        for _ in range(iters):
            u = log_mu - torch.logsumexp(zt + v.unsqueeze(1), dim=2)
            v = log_nu - torch.logsumexp(zt + u.unsqueeze(2), dim=1)
        zt = zt + u.unsqueeze(2) + v.unsqueeze(1) - norm

        z = ops.log_sinkhorn(jnp.asarray(scores_np), alpha, iters)
        np.testing.assert_allclose(np.asarray(z), zt.numpy(), atol=5e-4)


class TestPositionEncoding:
    def test_rotary_preserves_norm(self, rng):
        d = 48
        x = jnp.asarray(rng.randn(2, 10, d).astype(np.float32))
        pe = ops.volumetric_pe(jnp.asarray(rng.randn(2, 10, 3).astype(np.float32)), d,
                               [0.0, 0.0, 0.0], 0.08, "rotary")
        y = ops.embed_rotary(x, pe[..., 0], pe[..., 1])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_rotary_relative_property(self, rng):
        """<R(p)q, R(p')k> depends only on p - p' along each axis."""
        d = 24
        q = rng.randn(1, 1, d).astype(np.float32)
        k = rng.randn(1, 1, d).astype(np.float32)
        shift = np.array([[[0.31, -0.2, 0.07]]], np.float32)
        p1 = np.array([[[0.1, 0.5, -0.3]]], np.float32)
        p2 = p1 + shift
        p3 = np.array([[[-0.9, 0.2, 0.6]]], np.float32)
        p4 = p3 + shift

        def dot(pa, pb):
            pea = ops.volumetric_pe(jnp.asarray(pa), d, [0, 0, 0], 0.08, "rotary")
            peb = ops.volumetric_pe(jnp.asarray(pb), d, [0, 0, 0], 0.08, "rotary")
            qa = ops.embed_rotary(jnp.asarray(q), pea[..., 0], pea[..., 1])
            kb = ops.embed_rotary(jnp.asarray(k), peb[..., 0], peb[..., 1])
            return float(jnp.sum(qa * kb))

        assert abs(dot(p1, p2) - dot(p3, p4)) < 1e-3

    def test_sinusoidal_shapes(self, rng):
        d = 36
        pe = ops.volumetric_pe(jnp.zeros((1, 4, 3)), d, [0, 0, 0], 0.1, "sinusoidal")
        assert pe.shape == (1, 4, d)


class TestProcrustes:
    def test_kabsch_recovers_exact_pose(self, rng):
        r_gt, t_gt = random_rigid(rng)
        x = rng.randn(1, 50, 3).astype(np.float32)
        y = (r_gt @ x[0].T + t_gt).T[None]
        w = np.ones((1, 50, 1), np.float32)
        r, t, cond = weighted_kabsch(jnp.asarray(x), jnp.asarray(y.astype(np.float32)), jnp.asarray(w))
        # f32 cross-covariance accumulation bounds accuracy at ~1e-3
        np.testing.assert_allclose(np.asarray(r)[0], r_gt, atol=2e-3)
        np.testing.assert_allclose(np.asarray(t)[0], t_gt, atol=2e-3)

    def test_weights_ignore_outliers(self, rng):
        r_gt, t_gt = random_rigid(rng)
        x = rng.randn(1, 60, 3).astype(np.float32)
        y = (r_gt @ x[0].T + t_gt).T[None].astype(np.float32)
        y[0, :10] += rng.randn(10, 3) * 5  # corrupted correspondences
        w = np.ones((1, 60, 1), np.float32)
        w[0, :10] = 0.0
        r, t, _ = weighted_kabsch(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
        assert float(rotation_error_deg(r, jnp.asarray(r_gt[None]))[0]) < 0.1

    def test_soft_procrustes_from_conf_matrix(self, rng):
        r_gt, t_gt = random_rigid(rng)
        n = 40
        src = rng.randn(1, n, 3).astype(np.float32)
        tgt = (r_gt @ src[0].T + t_gt).T[None].astype(np.float32)
        perm = rng.permutation(n)
        conf = np.zeros((1, n, n), np.float32)
        conf[0, np.arange(n), perm] = 1.0
        tgt_perm = tgt[:, np.argsort(perm)]  # tgt st tgt_perm[perm[i]] == R src[i] + t
        mask = np.ones((1, n), bool)
        res = soft_procrustes(
            jnp.asarray(conf), jnp.asarray(src), jnp.asarray(tgt_perm),
            jnp.asarray(mask), jnp.asarray(mask),
            sample_rate=1.0, max_condition_num=1e6,
        )
        assert float(rotation_error_deg(res.rotation, jnp.asarray(r_gt[None]))[0]) < 0.5
        assert bool(res.solution_mask[0])

    def test_condition_gate_zero_forces_identity(self, rng):
        """Reference 3dmatch test config: max_condition_num == 0 ⇒ forward
        warp is always identity (procrustes.py:86-91 semantics)."""
        conf = jnp.asarray(rng.rand(1, 10, 10).astype(np.float32))
        pts = jnp.asarray(rng.randn(1, 10, 3).astype(np.float32))
        mask = jnp.ones((1, 10), bool)
        res = soft_procrustes(conf, pts, pts, mask, mask, sample_rate=1.0, max_condition_num=0.0)
        np.testing.assert_allclose(np.asarray(res.rotation_fwd)[0], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.translation_fwd)[0], 0.0, atol=1e-6)


class TestSelect:
    def test_mutual_top1_matches_argmax(self, rng):
        s = rng.rand(8, 6).astype(np.float32)
        corr = np.asarray(ops.mutual_topk_mask(jnp.asarray(s), 1, mutual=True))
        for i in range(8):
            for j in range(6):
                expected = (s[i].argmax() == j) and (s[:, j].argmax() == i)
                assert corr[i, j] == expected

    def test_extract_correspondences_sorted(self, rng):
        s = rng.rand(8, 6).astype(np.float32)
        corr = ops.mutual_topk_mask(jnp.asarray(s), 2, mutual=False)
        res = ops.extract_correspondences(corr, jnp.asarray(s), 32)
        nvalid = int(np.asarray(corr).sum())
        assert int(res.valid.sum()) == nvalid
        sc = np.asarray(res.scores)[:nvalid]
        assert np.all(np.diff(sc) <= 1e-6)

    def test_thresholded_mutual_argmax(self, rng):
        s = rng.rand(1, 5, 5).astype(np.float32)
        m = np.asarray(ops.thresholded_mutual_argmax_mask(jnp.asarray(s), thr=0.0, mutual=True))
        assert m.sum() >= 1
        i, j = np.argwhere(m[0])[0]
        assert s[0, i].argmax() == j and s[0, :, j].argmax() == i


class TestSubsample:
    def test_device_matches_numpy(self, rng):
        pts = rng.rand(200, 3).astype(np.float32)
        ref = ops.grid_subsample_np(pts, 0.1)
        sub, valid, n = ops.grid_subsample(jnp.asarray(pts), jnp.ones(200, bool), 0.1, 200)
        got = np.asarray(sub)[np.asarray(valid)]
        assert int(n) == len(ref)
        # compare as sets (ordering differs)
        got_sorted = got[np.lexsort(got.T)]
        ref_sorted = ref[np.lexsort(ref.T)]
        np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)

    def test_padding_ignored(self, rng):
        pts = np.zeros((64, 3), np.float32)
        pts[:32] = rng.rand(32, 3)
        valid = np.arange(64) < 32
        sub, sub_valid, n = ops.grid_subsample(jnp.asarray(pts), jnp.asarray(valid), 0.05, 64)
        ref = ops.grid_subsample_np(pts[:32], 0.05)
        assert int(n) == len(ref)


class TestNeighbors:
    def test_radius_matches_scipy(self, rng):
        q = rng.rand(50, 3).astype(np.float32)
        s = rng.rand(80, 3).astype(np.float32)
        r, k = 0.25, 12
        got = np.asarray(ops.radius_neighbors(
            jnp.asarray(q), jnp.ones(50, bool), jnp.asarray(s), jnp.ones(80, bool), r, k, chunk=16))
        ref = ops.radius_neighbors_np(q, s, r, k)
        # same sets of neighbor indices per row (both distance-sorted; ties may reorder)
        for i in range(50):
            assert set(got[i][got[i] < 80]) == set(ref[i][ref[i] < 80])

    def test_sorted_by_distance(self, rng):
        q = rng.rand(20, 3).astype(np.float32)
        s = rng.rand(60, 3).astype(np.float32)
        idx = np.asarray(ops.radius_neighbors(
            jnp.asarray(q), jnp.ones(20, bool), jnp.asarray(s), jnp.ones(60, bool), 0.5, 8, chunk=8))
        for i in range(20):
            real = idx[i][idx[i] < 60]
            d = np.linalg.norm(s[real] - q[i], axis=1)
            assert np.all(np.diff(d) >= -1e-6)

    def test_knn(self, rng):
        q = rng.rand(30, 3).astype(np.float32)
        s = rng.rand(90, 3).astype(np.float32)
        idx, dist = ops.knn(jnp.asarray(q), jnp.ones(30, bool), jnp.asarray(s), jnp.ones(90, bool), 4, chunk=16)
        ref_idx, ref_d = ops.knn_np(q, s, 4)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1), np.sort(ref_idx, axis=1))


class TestKPConv:
    def test_matches_bruteforce_numpy(self, rng):
        """KPConv against a direct numpy transcription of the math."""
        nq, ns, k, p, cin, cout = 13, 17, 6, 5, 4, 8
        q = rng.rand(nq, 3).astype(np.float32)
        s = rng.rand(ns, 3).astype(np.float32)
        inds = rng.randint(0, ns + 1, size=(nq, k)).astype(np.int32)  # includes sentinel
        x = rng.randn(ns, cin).astype(np.float32)
        kp = (rng.rand(p, 3).astype(np.float32) - 0.5) * 0.2
        w = rng.randn(p, cin, cout).astype(np.float32)
        extent = 0.3

        out = np.asarray(ops.kpconv(jnp.asarray(q), jnp.asarray(s), jnp.asarray(inds),
                                    jnp.asarray(x), jnp.asarray(kp), jnp.asarray(w), extent))

        s_pad = np.vstack([s, np.full((1, 3), 1e6, np.float32)])
        x_pad = np.vstack([x, np.zeros((1, cin), np.float32)])
        ref = np.zeros((nq, cout), np.float32)
        for i in range(nq):
            neigh = s_pad[inds[i]] - q[i]
            d = np.linalg.norm(neigh[:, None, :] - kp[None], axis=-1)  # [K, P]
            infl = np.clip(1 - d / extent, 0, None)
            nx = x_pad[inds[i]]                                        # [K, cin]
            weighted = infl.T @ nx                                     # [P, cin]
            o = sum(weighted[j] @ w[j] for j in range(p))
            count = max(1, int((nx.sum(-1) > 0).sum()))
            ref[i] = o / count
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_pools(self, rng):
        x = rng.randn(10, 4).astype(np.float32)
        inds = np.array([[0, 1, 10], [2, 10, 10]], np.int32)
        mx = np.asarray(ops.max_pool(jnp.asarray(x), jnp.asarray(inds)))
        np.testing.assert_allclose(mx[0], np.maximum(np.maximum(x[0], x[1]), 0))
        cp = np.asarray(ops.closest_pool(jnp.asarray(x), jnp.asarray(inds)))
        np.testing.assert_allclose(cp[1], x[2])


class TestKernelPoints:
    def test_disposition_contract(self):
        kp = ops.unit_kernel_points(15, 3, "center")
        assert kp.shape == (15, 3)
        np.testing.assert_allclose(kp[0], 0.0, atol=1e-7)
        r = np.linalg.norm(kp[1:], axis=1)
        np.testing.assert_allclose(r.mean(), 0.66, atol=0.01)
        # points are well spread: min pairwise distance not degenerate
        d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
        d[np.arange(15), np.arange(15)] = 9
        assert d.min() > 0.2

    def test_scaled(self):
        kp = ops.load_kernel_points(0.0625, 15, 3, "center")
        r = np.linalg.norm(kp[1:], axis=1)
        np.testing.assert_allclose(r.mean(), 0.66 * 0.0625, rtol=0.02)


class TestMasked:
    def test_instance_norm_matches_torch_on_valid(self, rng):
        import torch

        n, c = 21, 7
        x = rng.randn(n, c).astype(np.float32)
        # torch reference: InstanceNorm1d over [1, C, N]
        xt = torch.tensor(x).unsqueeze(2).transpose(0, 2)
        ref = torch.nn.InstanceNorm1d(c)(xt).transpose(0, 2).squeeze(2).numpy()

        pad = np.vstack([x, rng.randn(5, c).astype(np.float32)])
        mask = np.arange(n + 5) < n
        got = np.asarray(ops.masked_instance_norm(jnp.asarray(pad), jnp.asarray(mask)))
        np.testing.assert_allclose(got[:n], ref, atol=1e-4)
        np.testing.assert_allclose(got[n:], 0.0)
