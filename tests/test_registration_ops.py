"""Spatial consistency / PPF / LRF / normals / embedded deformation /
NeRF-render op twins — behavioral invariants + formula cross-checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu import ops
from diffreg_tpu.geometry import (apply_embedded_deformation,
                                  apply_embedded_deformation_dense,
                                  non_rigid_icp_adam)


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestSpatialConsistency:
    def test_rigid_correspondences_fully_consistent(self, rng):
        src = rng.randn(24, 3).astype(np.float32)
        tgt = src @ _rot_z(0.8).T + np.array([1, 2, 3], np.float32)
        sc = np.asarray(ops.spatial_consistency(jnp.asarray(src),
                                                jnp.asarray(tgt), sigma=0.1))
        # f32 a^2-2ab+b^2 distance cancellation leaves ~1e-3 jitter in the
        # pairwise deltas, amplified by /sigma^2
        np.testing.assert_allclose(sc, 1.0, atol=2e-3)

    def test_outliers_inconsistent(self, rng):
        src = rng.randn(24, 3).astype(np.float32)
        tgt = src @ _rot_z(0.8).T
        tgt[0] += 10.0                     # one outlier correspondence
        sc = np.asarray(ops.spatial_consistency(jnp.asarray(src),
                                                jnp.asarray(tgt), sigma=0.1))
        assert sc[0, 1:].max() < 1e-6 and sc[1:, 0].max() < 1e-6
        np.testing.assert_allclose(sc[1:, 1:], 1.0, atol=1e-4)

    def test_leading_eigenvector_identifies_inliers(self, rng):
        src = rng.randn(30, 3).astype(np.float32)
        tgt = src @ _rot_z(-0.4).T
        tgt[:5] += rng.randn(5, 3).astype(np.float32) * 5  # 5 outliers
        sc = ops.spatial_consistency(jnp.asarray(src), jnp.asarray(tgt), 0.1)
        v = np.abs(np.asarray(ops.leading_eigenvector(sc, num_iterations=20)))
        assert v[5:].min() > v[:5].max()   # inliers dominate the eigenvector

    def test_matches_numpy_eig(self, rng):
        m = rng.rand(12, 12).astype(np.float32)
        m = m @ m.T                        # SPD
        v = np.asarray(ops.leading_eigenvector(jnp.asarray(m), num_iterations=50))
        w, vecs = np.linalg.eigh(m)
        ref = vecs[:, -1]
        ref = ref * np.sign(ref @ v)
        np.testing.assert_allclose(v, ref, atol=1e-4)

    def test_cross_consistency_shape(self, rng):
        a = rng.randn(8, 3).astype(np.float32)
        b = rng.randn(8, 3).astype(np.float32)
        c = rng.randn(5, 3).astype(np.float32)
        d = rng.randn(5, 3).astype(np.float32)
        out = ops.cross_spatial_consistency(jnp.asarray(a), jnp.asarray(b),
                                            jnp.asarray(c), jnp.asarray(d), 0.1)
        assert out.shape == (8, 5)


class TestFeatures:
    def test_vector_angle_known(self):
        x = jnp.asarray([[1.0, 0, 0]])
        y = jnp.asarray([[0.0, 1, 0]])
        np.testing.assert_allclose(float(ops.vector_angle(x, y)[0]),
                                   np.pi / 2, rtol=1e-6)
        np.testing.assert_allclose(
            float(ops.vector_angle(x, y, use_degree=True)[0]), 90.0, rtol=1e-6)

    def test_global_ppf_rigid_invariant(self, rng):
        pts = rng.randn(1, 10, 3).astype(np.float32)
        nrm = rng.randn(1, 10, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        r = _rot_z(0.3)
        f1 = np.asarray(ops.global_ppf(jnp.asarray(pts), jnp.asarray(nrm)))
        f2 = np.asarray(ops.global_ppf(jnp.asarray(pts @ r.T),
                                       jnp.asarray(nrm @ r.T)))
        np.testing.assert_allclose(f1, f2, atol=1e-4)

    def test_local_ppf_channels(self, rng):
        q = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32))
        nrm = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        idx = jnp.asarray(rng.randint(0, 6, (1, 6, 3)))
        f = ops.local_ppf(q, q, nrm, nrm, idx, use_absolute_position=True,
                          use_relative_position=True)
        assert f.shape == (1, 6, 3, 10)

    def test_lrf_rotation_invariant_coordinates(self, rng):
        # LRF coordinates of neighbors must be invariant to a global rotation
        pts = rng.randn(1, 16, 3).astype(np.float32)
        nrm = rng.randn(1, 16, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        r = _rot_z(1.1)
        l1 = np.asarray(ops.build_local_reference_frame(
            jnp.asarray(pts), jnp.asarray(nrm), 5))
        l2 = np.asarray(ops.build_local_reference_frame(
            jnp.asarray(pts @ r.T), jnp.asarray(nrm @ r.T), 5))
        np.testing.assert_allclose(l1, l2, atol=1e-4)

    def test_estimate_normals_on_plane(self, rng):
        # points on z=0 plane: normals must be +-e_z
        pts = np.concatenate([rng.rand(64, 2).astype(np.float32) * 2,
                              np.zeros((64, 1), np.float32)], axis=1)
        n = np.asarray(ops.estimate_normals(jnp.asarray(pts), k=8))
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
        np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-4)


class TestEmbeddedDeformation:
    def test_dense_identity(self, rng):
        pts = rng.randn(10, 3).astype(np.float32)
        nodes = rng.randn(4, 3).astype(np.float32)
        rots = np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1))
        trns = np.zeros((4, 3), np.float32)
        w = rng.rand(10, 4).astype(np.float32)
        out = np.asarray(apply_embedded_deformation_dense(
            jnp.asarray(pts), jnp.asarray(nodes), jnp.asarray(rots),
            jnp.asarray(trns), jnp.asarray(w)))
        np.testing.assert_allclose(out, pts, atol=2e-6)

    def test_anchor_variant_matches_dense(self, rng):
        pts = rng.randn(10, 3).astype(np.float32)
        nodes = rng.randn(4, 3).astype(np.float32)
        rots = np.stack([_rot_z(a) for a in rng.rand(4) * 0.5])
        trns = rng.randn(4, 3).astype(np.float32) * 0.1
        # anchors = all 4 nodes per point -> equals dense with same weights
        anchor_idx = np.tile(np.arange(4), (10, 1))
        anchor_w = rng.rand(10, 4).astype(np.float32)
        a = np.asarray(apply_embedded_deformation(
            jnp.asarray(pts), jnp.asarray(nodes), jnp.asarray(rots),
            jnp.asarray(trns), jnp.asarray(anchor_idx), jnp.asarray(anchor_w)))
        b = np.asarray(apply_embedded_deformation_dense(
            jnp.asarray(pts), jnp.asarray(nodes), jnp.asarray(rots),
            jnp.asarray(trns), jnp.asarray(anchor_w)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_negative_anchor_ignored(self, rng):
        pts = rng.randn(6, 3).astype(np.float32)
        nodes = rng.randn(3, 3).astype(np.float32)
        rots = np.tile(np.eye(3, dtype=np.float32)[None], (3, 1, 1))
        trns = np.array([[1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32)
        idx = np.array([[0, -1]] * 6)
        w = np.ones((6, 2), np.float32)
        out = np.asarray(apply_embedded_deformation(
            jnp.asarray(pts), jnp.asarray(nodes), jnp.asarray(rots),
            jnp.asarray(trns), jnp.asarray(idx), jnp.asarray(w)))
        # reference semantics (embedded_deformation.py:53-66): weights are
        # normalized over ALL K anchors and invalid entries are then dropped
        # from the sum — a point with half its anchors missing contributes
        # 0.5 * (p + t0), NOT p + 0.5 t0
        want = 0.5 * (pts + np.array([1.0, 0, 0], np.float32))
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_gauss_newton_icp_recovers_rigid_motion(self, rng):
        from diffreg_tpu.geometry import non_rigid_icp_gauss_newton

        nodes = rng.rand(5, 3).astype(np.float32) * 2
        pts = rng.rand(30, 3).astype(np.float32) * 2
        r_gt = _rot_z(0.3)
        t_gt = np.array([0.2, -0.1, 0.3], np.float32)
        tgt = pts @ r_gt.T + t_gt
        d = np.linalg.norm(pts[:, None] - nodes[None], axis=-1)
        idx = np.argsort(d, axis=1)[:, :3]
        w = np.exp(-np.take_along_axis(d, idx, axis=1) ** 2).astype(np.float32)
        edges = np.array([[i, j] for i in range(5) for j in range(5) if i != j])
        rot, trn = non_rigid_icp_gauss_newton(
            jnp.asarray(nodes), jnp.asarray(pts), jnp.asarray(tgt),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(edges),
            arap_lambda=0.3, lm_lambda=0.01, num_iterations=5)
        from diffreg_tpu.geometry import apply_embedded_deformation

        warped = np.asarray(apply_embedded_deformation(
            jnp.asarray(pts), jnp.asarray(nodes), rot, trn,
            jnp.asarray(idx), jnp.asarray(w)))
        resid = np.linalg.norm(warped - tgt, axis=1)
        assert resid.mean() < 5e-3, resid.mean()
        # a rigid GT with strong ARAP coupling: every node finds ~the same R
        rots = np.asarray(rot)
        np.testing.assert_allclose(rots, np.tile(r_gt, (5, 1, 1)), atol=0.05)

    @pytest.mark.slow
    def test_nonrigid_icp_recovers_translation_field(self, rng):
        nodes = rng.rand(6, 3).astype(np.float32) * 2
        pts = rng.rand(40, 3).astype(np.float32) * 2
        # GT: smooth per-node translations, no rotation
        gt_trn = np.stack([0.2 * nodes[:, 0], -0.1 * nodes[:, 1],
                           np.full(6, 0.05)], axis=1).astype(np.float32)
        d = np.linalg.norm(pts[:, None] - nodes[None], axis=-1)
        idx = np.argsort(d, axis=1)[:, :3]
        w = np.exp(-np.take_along_axis(d, idx, axis=1) ** 2)
        tgt = np.asarray(apply_embedded_deformation(
            jnp.asarray(pts), jnp.asarray(nodes),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (6, 1, 1))),
            jnp.asarray(gt_trn), jnp.asarray(idx), jnp.asarray(w.astype(np.float32))))
        edges = np.array([[i, j] for i in range(6) for j in range(6) if i != j])
        r, t = non_rigid_icp_adam(
            jnp.asarray(nodes), jnp.asarray(pts), jnp.asarray(tgt),
            jnp.asarray(idx), jnp.asarray(w.astype(np.float32)),
            jnp.asarray(edges), jnp.ones(len(edges)) * 0.1,
            num_iterations=300, lr=2e-2)
        warped = np.asarray(apply_embedded_deformation(
            jnp.asarray(pts), jnp.asarray(nodes), r, t,
            jnp.asarray(idx), jnp.asarray(w.astype(np.float32))))
        resid = np.linalg.norm(warped - np.asarray(tgt), axis=1)
        assert resid.mean() < 0.02, resid.mean()


class TestConversion:
    def test_roundtrip(self, rng):
        b, n, c = 3, 7, 4
        x = rng.randn(b, n, c).astype(np.float32)
        masks = rng.rand(b, n) > 0.4
        masks[:, 0] = True                 # every sample nonempty
        packed, lengths, pvalid = ops.batch_to_pack(jnp.asarray(x),
                                                    jnp.asarray(masks))
        assert int(np.asarray(pvalid).sum()) == int(masks.sum())
        np.testing.assert_array_equal(np.asarray(lengths), masks.sum(1))
        back, masks2 = ops.pack_to_batch(packed, lengths, max_length=n)
        # valid rows round-trip exactly (pack order is batch-major)
        for i in range(b):
            np.testing.assert_allclose(
                np.asarray(back)[i][np.asarray(masks2)[i]], x[i][masks[i]])

    def test_fill_value(self, rng):
        packed = jnp.asarray(rng.randn(5, 2).astype(np.float32))
        lengths = jnp.asarray([2, 3])
        batch, masks = ops.pack_to_batch(packed, lengths, max_length=4,
                                         fill_value=-7.0)
        assert (np.asarray(batch)[~np.asarray(masks)] == -7.0).all()


class TestSO3:
    def test_roundtrips(self, rng):
        from diffreg_tpu import geometry as geo

        phi = rng.randn(16, 3).astype(np.float32)
        q = geo.axis_angle_to_quaternion(jnp.asarray(phi))
        phi2 = np.asarray(geo.quaternion_to_axis_angle(q))
        # axis-angle roundtrip is unique for |phi| < pi
        small = np.linalg.norm(phi, axis=1) < np.pi
        np.testing.assert_allclose(phi2[small], phi[small], atol=1e-4)
        r = geo.axis_angle_to_rotation_matrix(jnp.asarray(phi))
        r2 = geo.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-5)
        phi3 = np.asarray(geo.rotation_matrix_to_axis_angle(r))
        np.testing.assert_allclose(phi3[small], phi[small], atol=1e-3)

    def test_rodrigues_vs_known(self):
        from diffreg_tpu import geometry as geo

        r = np.asarray(geo.rodrigues_rotation_formula(
            jnp.asarray([[0.0, 0, 1]]), jnp.asarray([np.pi / 2])))[0]
        np.testing.assert_allclose(r, _rot_z(np.pi / 2), atol=1e-6)
        # zero axis -> identity
        r0 = np.asarray(geo.axis_angle_to_rotation_matrix(jnp.zeros((1, 3))))[0]
        np.testing.assert_allclose(r0, np.eye(3), atol=1e-6)

    def test_quaternion_rotate_matches_matrix(self, rng):
        from diffreg_tpu import geometry as geo

        phi = rng.randn(8, 3).astype(np.float32)
        q = geo.axis_angle_to_quaternion(jnp.asarray(phi))
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        y1 = np.asarray(geo.quaternion_rotate(q, x))
        r = geo.quaternion_to_matrix(q)
        y2 = np.asarray(jnp.einsum("bij,bj->bi", r, x))
        np.testing.assert_allclose(y1, y2, atol=1e-4)

    def test_alignment_rotation(self, rng):
        from diffreg_tpu import geometry as geo

        a = rng.randn(32, 3).astype(np.float32)
        b = rng.randn(32, 3).astype(np.float32)
        r = np.asarray(geo.alignment_rotation_matrix(jnp.asarray(a), jnp.asarray(b)))
        ra = np.einsum("bij,bj->bi", r, a / np.linalg.norm(a, axis=1, keepdims=True))
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        np.testing.assert_allclose(ra, bn, atol=1e-4)
        # antiparallel degenerate case: still a proper pi rotation
        v = np.array([[1.0, 0, 0]], np.float32)
        rd = np.asarray(geo.alignment_rotation_matrix(jnp.asarray(v), jnp.asarray(-v)))[0]
        np.testing.assert_allclose(rd @ v[0], -v[0], atol=1e-5)
        np.testing.assert_allclose(rd @ rd.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(rd) > 0.99

    def test_skew(self, rng):
        from diffreg_tpu import geometry as geo

        v = rng.randn(5, 3).astype(np.float32)
        w = rng.randn(5, 3).astype(np.float32)
        kx = np.asarray(geo.skew_symmetric_matrix(jnp.asarray(v)))
        np.testing.assert_allclose(np.einsum("bij,bj->bi", kx, w),
                                   np.cross(v, w), atol=1e-6)


class TestRender:
    def test_sample_pdf_deterministic_in_heavy_bin(self, rng):
        loc = jnp.asarray(np.linspace(0, 1, 5, dtype=np.float32)[None].repeat(3, 0))
        w = np.zeros((3, 4), np.float32)
        w[:, 2] = 1.0                      # all mass in bin [0.5, 0.75]
        s = np.asarray(ops.sample_pdf(None, loc, jnp.asarray(w), 16,
                                      deterministic=True))
        inside = (s >= 0.5) & (s <= 0.75)
        # the deterministic linspace includes t=0 and t=1, which land on the
        # outer bin edges (reference-identical); the 14 interior samples hit
        # the heavy bin
        assert inside.mean() >= 14.0 / 16.0

    def test_sample_pdf_random_shape(self, rng):
        loc = jnp.asarray(np.sort(rng.rand(2, 6), axis=1).astype(np.float32))
        w = jnp.asarray(rng.rand(2, 5).astype(np.float32))
        s = ops.sample_pdf(jax.random.PRNGKey(0), loc, w, 8)
        assert s.shape == (2, 8)
        assert np.isfinite(np.asarray(s)).all()

    def test_volume_render_opaque_surface(self, rng):
        n, m = 4, 16
        dirs = jnp.asarray(np.tile([[0, 0, 1.0]], (n, 1)).astype(np.float32))
        z = jnp.asarray(np.tile(np.linspace(0.5, 3.0, m, dtype=np.float32), (n, 1)))
        sig = np.zeros((n, m), np.float32)
        sig[:, 8] = 1e4                    # opaque wall at z[8]
        colors = jnp.asarray(np.tile([[1.0, 0.5, 0.25]], (n, m, 1)).astype(np.float32))
        c, d, o = ops.volume_render(dirs, z, jnp.asarray(sig), colors,
                                    deterministic=True)
        np.testing.assert_allclose(np.asarray(d), float(z[0, 8]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(c), [[1.0, 0.5, 0.25]] * n, atol=1e-3)

    def test_volume_render_empty_space_white_bg(self):
        n, m = 2, 8
        dirs = jnp.ones((n, 3)) / np.sqrt(3)
        z = jnp.asarray(np.tile(np.linspace(0.1, 1.0, m, dtype=np.float32), (n, 1)))
        sig = jnp.zeros((n, m))
        colors = jnp.zeros((n, m, 3))
        c, d, o = ops.volume_render(dirs, z, sig, colors, white_background=True,
                                    deterministic=True)
        np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-5)
