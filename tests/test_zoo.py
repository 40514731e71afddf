"""Model-zoo twins: shape/finite checks + behavioral invariants, with the
math-heavy pieces cross-checked against independently written formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu import zoo


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestGeoEmbedding:
    def test_sinusoidal_matches_formula(self, rng):
        idx = jnp.asarray(rng.rand(5, 7).astype(np.float32) * 10)
        d = 8
        emb = np.asarray(zoo.sinusoidal_embedding(idx, d))
        assert emb.shape == (5, 7, d)
        div = np.exp(np.arange(d // 2) * (-np.log(10000.0) * 2 / d))
        om = np.asarray(idx)[..., None] * div
        np.testing.assert_allclose(emb[..., 0::2], np.sin(om), atol=1e-6)
        np.testing.assert_allclose(emb[..., 1::2], np.cos(om), atol=1e-6)

    def test_embedding_rigid_invariant(self, rng):
        # distances and angles are rigid invariants -> embedding must be too
        pts = rng.randn(1, 12, 3).astype(np.float32)
        r = _rot_z(0.7)
        pts2 = pts @ r.T + np.array([1.0, -2.0, 0.5], np.float32)
        m = zoo.GeometricStructureEmbedding(16, sigma_d=0.2)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
        e1 = m.apply(params, jnp.asarray(pts))
        e2 = m.apply(params, jnp.asarray(pts2))
        # f32: dist/sigma_d reaches ~20 rad, so coordinate rounding is
        # amplified by the high-frequency sinusoids — ~1e-2 rel is pure float
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                                   rtol=1.5e-2, atol=5e-3)

    def test_v2_shapes(self, rng):
        pts = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
        m = zoo.GeometricStructureEmbeddingV2(16, sigma_d=0.2)
        params = m.init(jax.random.PRNGKey(0), pts)
        e = m.apply(params, pts)
        assert e.shape == (2, 10, 10, 16)
        assert np.isfinite(np.asarray(e)).all()


class TestGeoTransformer:
    @pytest.mark.parametrize("lite", [False, True])
    def test_forward_masked(self, rng, lite):
        b, n, m, c = 1, 10, 12, 16
        sp = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        tp = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
        sf = jnp.asarray(rng.randn(b, n, 24).astype(np.float32))
        tf = jnp.asarray(rng.randn(b, m, 24).astype(np.float32))
        sm = jnp.asarray(rng.rand(b, n) > 0.2)
        tm = jnp.asarray(rng.rand(b, m) > 0.2)
        mod = zoo.GeometricTransformer(24, 20, c, 4, ("self", "cross", "self"),
                                       sigma_d=0.2, lite=lite)
        params = mod.init(jax.random.PRNGKey(0), sp, tp, sf, tf, sm, tm)
        so, to = mod.apply(params, sp, tp, sf, tf, sm, tm)
        assert so.shape == (b, n, 20) and to.shape == (b, m, 20)
        assert np.isfinite(np.asarray(so)).all()

    def test_siamese(self, rng):
        sf = jnp.asarray(rng.randn(1, 8, 12).astype(np.float32))
        tf = jnp.asarray(rng.randn(1, 9, 12).astype(np.float32))
        mod = zoo.VanillaSiameseTransformer(12, 10, 16, 4, ("self", "cross"))
        params = mod.init(jax.random.PRNGKey(0), sf, tf)
        so, to = mod.apply(params, sf, tf)
        assert so.shape == (1, 8, 10) and to.shape == (1, 9, 10)


class TestSuperpointMatching:
    def test_mutual_topk_exact_match(self, rng):
        f = rng.randn(10, 8).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        perm = rng.permutation(10)
        si, ti, scores, valid = jax.jit(
            lambda a, b: zoo.superpoint_matching_mutual_topk(a, b, k=2,
                                                             num_correspondences=10)
        )(jnp.asarray(f), jnp.asarray(f[perm]))
        si, ti, valid = np.asarray(si), np.asarray(ti), np.asarray(valid)
        # every kept pair must be the exact permutation match
        assert valid.sum() >= 10
        assert (perm[ti[valid]] == si[valid]).all() or \
            (ti[valid] == np.argsort(perm)[si[valid]]).all()

    def test_global_topk_dual_normalization(self, rng):
        f = rng.randn(10, 6).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        si, ti, sc, keep = zoo.superpoint_matching_global_topk(
            jnp.asarray(f), jnp.asarray(f), num_correspondences=10)
        si, ti, keep = np.asarray(si), np.asarray(ti), np.asarray(keep)
        # identical feature sets: diagonal dominates under dual normalization
        assert keep.all()
        assert (si == ti).mean() > 0.8
        # masked rows never selected
        m = np.ones(10, bool); m[0] = False
        si2, ti2, sc2, keep2 = zoo.superpoint_matching_global_topk(
            jnp.asarray(f), jnp.asarray(f), 10, src_masks=jnp.asarray(m))
        assert (np.asarray(si2)[np.asarray(keep2)] != 0).all()

    def test_adaptive_fallback(self, rng):
        f0 = rng.randn(6, 4).astype(np.float32)
        f1 = rng.randn(7, 4).astype(np.float32)
        si, ti, sc, keep = zoo.adaptive_superpoint_matching(
            jnp.asarray(f0), jnp.asarray(f1), min_num_correspondences=5,
            similarity_threshold=-1.0)   # nothing passes -> fallback top-5
        assert int(np.asarray(keep).sum()) == 5


class TestLGR:
    def test_recovers_pose(self, rng):
        # 8 patches x 16 knn points each, exact correspondences on the diag
        b, k = 8, 16
        src = rng.randn(b, k, 3).astype(np.float32)
        r = _rot_z(0.5)
        t = np.array([0.3, -0.2, 0.8], np.float32)
        tgt = src @ r.T + t
        masks = np.ones((b, k), bool)
        # log-likelihood matrix peaked on the diagonal
        score = np.full((b, k, k), -8.0, np.float32)
        score[:, np.arange(k), np.arange(k)] = 0.0
        cfg = zoo.LGRConfig(matching=zoo.PointMatchingConfig(k=1),
                            acceptance_radius=0.05,
                            max_global_correspondences=256)
        gs, gt_, sc, valid, rot, trn = jax.jit(
            lambda *a: zoo.local_global_registration(*a, cfg=cfg))(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(masks),
            jnp.asarray(masks), jnp.asarray(score), jnp.ones(b))
        np.testing.assert_allclose(np.asarray(rot), r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(trn), t, atol=1e-4)
        assert int(np.asarray(valid).sum()) == b * k

    def test_deduplicate_correspondences(self):
        si = jnp.asarray([0, 1, 0, 2, 1])
        ti = jnp.asarray([3, 4, 3, 5, 4])
        valid = jnp.asarray([True, True, True, True, False])
        keep = np.asarray(zoo.deduplicate_correspondences(si, ti, valid, 8))
        assert keep.sum() == 3                 # (0,3), (1,4), (2,5)
        # one of each duplicate group survives
        assert keep[3]
        assert keep[0] != keep[2]

    def test_lgr_threshold_variant(self, rng):
        b, k = 4, 8
        src = rng.randn(b, k, 3).astype(np.float32)
        r = _rot_z(-0.3)
        t = np.array([0.1, 0.4, 0.0], np.float32)
        tgt = src @ r.T + t
        masks = np.ones((b, k), bool)
        score = np.full((b, k, k), -8.0, np.float32)
        score[:, np.arange(k), np.arange(k)] = 0.0
        cfg = zoo.LGRConfig(
            matching=zoo.PointMatchingConfig(selection="threshold",
                                             confidence_threshold=0.5),
            acceptance_radius=0.05, max_global_correspondences=64)
        *_, rot, trn = zoo.local_global_registration(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(masks),
            jnp.asarray(masks), jnp.asarray(score), jnp.ones(b), cfg)
        np.testing.assert_allclose(np.asarray(rot), r, atol=1e-4)

    def test_point_matching_extraction(self, rng):
        b, k = 3, 6
        score = rng.randn(b, k, k).astype(np.float32)
        masks = np.ones((b, k), bool)
        pts = rng.randn(b, k, 3).astype(np.float32)
        idx = np.tile(np.arange(k), (b, 1))
        sp, tp, si, ti, sc, valid = zoo.point_matching(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(masks),
            jnp.asarray(masks), jnp.asarray(idx), jnp.asarray(idx),
            jnp.asarray(score), jnp.ones(b),
            zoo.PointMatchingConfig(k=2, confidence_threshold=0.0),
            max_correspondences=32)
        v = np.asarray(valid)
        assert v.any()
        assert np.isfinite(np.asarray(sc)[v]).all()


class TestCofinet:
    def test_node_matching_threshold_and_fallback(self, rng):
        log_s = jnp.asarray(np.log(rng.rand(8, 9).astype(np.float32) * 0.5 + 1e-3))
        si, ti, sc, keep = zoo.cofinet_node_matching(
            log_s, min_num_correspondences=4, confidence_threshold=0.9,
            capacity=16)
        assert int(np.asarray(keep).sum()) == 4  # nothing above 0.9 -> top-4
        si2, ti2, sc2, keep2 = zoo.cofinet_node_matching(
            log_s, min_num_correspondences=2, confidence_threshold=0.05,
            capacity=72)
        want = (np.exp(np.asarray(log_s)) > 0.05).sum()
        assert int(np.asarray(keep2).sum()) == int(want)

    def test_node_proposals_overlap_weighted(self, rng):
        n = 50
        ov = np.zeros(n, np.float32)
        ov[:10] = 1.0                          # only first 10 have overlap
        valid = np.ones(n, bool)
        si, ti, o, keep = zoo.cofinet_node_proposals(
            jax.random.PRNGKey(0), jnp.arange(n), jnp.arange(n),
            jnp.asarray(ov), jnp.asarray(valid), num_proposals=8)
        sel = np.asarray(si)[np.asarray(keep)]
        assert (sel < 10).all()                # zero-overlap rows never chosen


class TestPredator:
    def test_gcn_forward(self, rng):
        b, n, c = 1, 20, 16
        coords = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        mod = zoo.PredatorGCN(c, 4, 6, ("self", "cross", "self"))
        params = mod.init(jax.random.PRNGKey(0), coords, coords, feats, feats)
        d0, d1 = mod.apply(params, coords, coords, feats, feats)
        assert d0.shape == (b, n, c)
        assert np.isfinite(np.asarray(d0)).all()

    def test_overlap_mask_survives_padded_aliasing(self, rng):
        # padded corr rows aliasing index 0 must not erase its membership
        n = 10
        pts = rng.randn(n, 3).astype(np.float32)
        feats = rng.randn(n, 4).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        pairs = np.array([[0, 0], [1, 1], [0, 0]])
        mask = np.array([True, True, False])
        out = zoo.predator_loss(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
            jnp.asarray(feats), jnp.ones(n, bool), jnp.ones(n, bool),
            jnp.asarray(pairs), jnp.asarray(mask), jnp.eye(3), jnp.zeros(3),
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9,
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9, zoo.PredatorLossConfig())
        ref = zoo.predator_loss(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
            jnp.asarray(feats), jnp.ones(n, bool), jnp.ones(n, bool),
            jnp.asarray(pairs[:2]), jnp.ones(2, bool), jnp.eye(3), jnp.zeros(3),
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9,
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9, zoo.PredatorLossConfig())
        np.testing.assert_allclose(float(out["overlap_loss"]),
                                   float(ref["overlap_loss"]), rtol=1e-5)

    def test_predator_loss_separates(self, rng):
        n = 24
        pts = rng.randn(n, 3).astype(np.float32)
        feats = rng.randn(n, 8).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        pairs = np.stack([np.arange(12), np.arange(12)], axis=1)
        mask = np.ones(12, bool)
        out = zoo.predator_loss(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
            jnp.asarray(feats), jnp.ones(n, bool), jnp.ones(n, bool),
            jnp.asarray(pairs), jnp.asarray(mask),
            jnp.eye(3), jnp.zeros(3),
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9,
            jnp.ones(n) * 0.9, jnp.ones(n) * 0.9,
            zoo.PredatorLossConfig())
        for k, v in out.items():
            assert np.isfinite(float(v)), k
        # identical clouds, identical feats -> perfect recall
        assert float(out["recall"]) == 1.0


class TestD3Feat:
    def test_detection_scores_gate(self, rng):
        n, k, c = 12, 4, 8
        feats = np.abs(rng.randn(n, c).astype(np.float32))
        nbrs = rng.randint(0, n, (n, k)).astype(np.int32)
        nbrs[0, 2:] = n                        # shadow neighbors
        s_train = zoo.compute_detection_scores(jnp.asarray(feats),
                                               jnp.asarray(nbrs), True)
        s_test = zoo.compute_detection_scores(jnp.asarray(feats),
                                              jnp.asarray(nbrs), False)
        assert s_train.shape == (n,)
        assert (np.asarray(s_test) <= np.asarray(s_train) + 1e-6).all()

    def test_d3feat_loss_prefers_matching_features(self, rng):
        p = 16
        pts = rng.rand(p, 3).astype(np.float32) * 4
        good = rng.randn(p, 8).astype(np.float32)
        good /= np.linalg.norm(good, axis=1, keepdims=True)
        cfg = zoo.D3FeatLossConfig(pos_radius=0.05, neg_radius=0.5)
        args = lambda f1: (jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(good),
                           jnp.asarray(f1), jnp.ones(p) * 0.5, jnp.ones(p) * 0.5,
                           jnp.ones(p, bool), jnp.eye(3), jnp.zeros(3))
        l_good = zoo.d3feat_loss(*args(good), cfg=cfg)
        bad = good[rng.permutation(p)]
        l_bad = zoo.d3feat_loss(*args(bad), cfg=cfg)
        assert float(l_good["circle_loss"]) < float(l_bad["circle_loss"])
        assert float(l_good["recall"]) == 1.0


class TestPointNets:
    def test_tnet_identity_at_init(self, rng):
        pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
        m = zoo.TNet(3, (16, 32), (16,))
        params = m.init(jax.random.PRNGKey(0), pts)
        t = np.asarray(m.apply(params, pts))
        # zero-init weight + identity bias -> exact identity transform
        np.testing.assert_allclose(t, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
        assert float(zoo.tnet_loss(jnp.asarray(t))) < 1e-10

    def test_set_abstraction(self, rng):
        pts = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
        m = zoo.SetAbstractionModule((16, 24), num_centroids=8, num_samples=6,
                                     radius=10.0)
        params = m.init(jax.random.PRNGKey(0), pts)
        q, f = m.apply(params, pts)
        assert q.shape == (2, 8, 3) and f.shape == (2, 8, 24)

    def test_msg_concat(self, rng):
        pts = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        cfgs = ({"output_dims": (8,), "num_samples": 4, "radius": 1.0},
                {"output_dims": (12,), "num_samples": 8, "radius": 5.0})
        m = zoo.MultiScaleSetAbstractionModule(8, cfgs)
        params = m.init(jax.random.PRNGKey(0), pts)
        q, f = m.apply(params, pts)
        assert f.shape == (1, 8, 20)

    def test_point_transformer_block(self, rng):
        pts = jnp.asarray(rng.randn(1, 24, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 24, 16).astype(np.float32))
        m = zoo.PointTransformerBlock(16, 16, num_neighbors=6)
        params = m.init(jax.random.PRNGKey(0), feats, pts)
        f, p = m.apply(params, feats, pts)
        assert f.shape == feats.shape

    def test_transition_down(self, rng):
        pts = jnp.asarray(rng.randn(1, 24, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 24, 8).astype(np.float32))
        m = zoo.TransitionDownBlock(12, downsample_ratio=4, num_neighbors=4)
        params = m.init(jax.random.PRNGKey(0), feats, pts)
        f, c = m.apply(params, feats, pts)
        assert f.shape == (1, 6, 12) and c.shape == (1, 6, 3)

    def test_pat_modules(self, rng):
        pts = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))
        arpe = zoo.AbsoluteRelativePositionEmbedding((16,), (24,), num_neighbor=5)
        params = arpe.init(jax.random.PRNGKey(0), pts)
        f = arpe.apply(params, pts)
        assert f.shape == (1, 20, 24)
        gsa = zoo.GroupShuffleAttention(24, groups=8)
        p2 = gsa.init(jax.random.PRNGKey(1), f)
        f2 = gsa.apply(p2, f)
        assert f2.shape == f.shape
        gss = zoo.GumbelSubsetSampling(6)
        p3 = gss.init({"params": jax.random.PRNGKey(2)}, f2,
                      rng=jax.random.PRNGKey(3), training=True)
        f3 = gss.apply(p3, f2, rng=jax.random.PRNGKey(4), training=True)
        assert f3.shape == (1, 6, 24)
        f3h = gss.apply(p3, f2, training=False)
        assert f3h.shape == (1, 6, 24)

    def test_foldingnet_shape(self, rng):
        code = jnp.asarray(rng.randn(2, 32).astype(np.float32))
        m = zoo.FoldingNet(32, 64, steps=5)
        params = m.init(jax.random.PRNGKey(0), code)
        pts = m.apply(params, code)
        assert pts.shape == (2, 25, 3)


class TestURR:
    def test_extractor_finds_exact_matches(self, rng):
        n = 20
        f = rng.randn(n, 8).astype(np.float32)
        f /= np.linalg.norm(f, axis=1, keepdims=True)
        pts = rng.randn(n, 3).astype(np.float32)
        s, t, w = zoo.urr_extract_correspondences(
            jnp.asarray(pts), jnp.asarray(pts + 5.0), jnp.asarray(f),
            jnp.asarray(f), num_correspondences=8)
        np.testing.assert_allclose(np.asarray(t) - np.asarray(s), 5.0, atol=1e-5)

    def test_randomized_procrustes_recovers(self, rng):
        n = 64
        src = rng.randn(1, n, 3).astype(np.float32)
        r = _rot_z(0.4)
        t = np.array([0.1, 0.2, -0.3], np.float32)
        tgt = src @ r.T + t
        rr, tt = zoo.randomized_weighted_procrustes(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt),
            jnp.ones((1, n)), num_subsets=4, num_samples=16)
        np.testing.assert_allclose(np.asarray(rr)[0], r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(tt)[0], t, atol=1e-4)

    def test_render_depth(self, rng):
        # a flat wall of points at z=2 must render depth ~2 where covered
        h = w = 16
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        zs = np.full(h * w, 2.0, np.float32)
        fx = fy = 1.0
        pts = np.stack([(xs.reshape(-1) - 0) / fx * 2.0,
                        (ys.reshape(-1)) / fy * 2.0, zs], axis=-1).astype(np.float32)
        intr = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1]], np.float32)
        depth, colors, feats, mask = zoo.differentiable_render(
            jnp.asarray(pts), None, None, jnp.asarray(intr), h, w,
            num_samples=4, radius=1.5, sigma=1.0)
        d = np.asarray(depth)[np.asarray(mask)]
        assert d.size > 0
        np.testing.assert_allclose(d, 2.0, atol=1e-3)


class TestVectorNeurons:
    def _equivariant(self, rng, make, shape=(2, 16, 8, 3)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        r = jnp.asarray(_rot_z(0.9))
        mod = make()
        params = mod.init(jax.random.PRNGKey(0), x)
        y_then_rot = np.asarray(mod.apply(params, x) @ r.T)
        rot_then_y = np.asarray(mod.apply(params, x @ r.T))
        np.testing.assert_allclose(rot_then_y, y_then_rot, atol=2e-5)

    def test_vn_linear_equivariant(self, rng):
        self._equivariant(rng, lambda: zoo.VNLinear(12))

    def test_vn_leaky_equivariant(self, rng):
        self._equivariant(rng, lambda: zoo.VNLeakyReLU())

    def test_vn_linear_leaky_equivariant(self, rng):
        self._equivariant(rng, lambda: zoo.VNLinearLeakyReLU(12))

    def test_vn_norm_equivariant(self, rng):
        self._equivariant(rng, lambda: zoo.VNBatchNorm())

    def test_vn_maxpool_equivariant(self, rng):
        self._equivariant(rng, lambda: zoo.VNMaxPool(), shape=(2, 6, 5, 8, 3))

    def test_vn_std_feature_invariant(self, rng):
        x = jnp.asarray(rng.randn(2, 10, 8, 3).astype(np.float32))
        r = jnp.asarray(_rot_z(-1.2))
        mod = zoo.VNStdFeature(8)
        params = mod.init(jax.random.PRNGKey(0), x)
        std1, _ = mod.apply(params, x)
        std2, _ = mod.apply(params, x @ r.T)
        np.testing.assert_allclose(np.asarray(std1), np.asarray(std2), atol=2e-4)


class TestLayerLibrary:
    def test_edge_conv_mask(self, rng):
        q = jnp.asarray(rng.randn(1, 6, 4).astype(np.float32))
        s = jnp.asarray(rng.randn(1, 9, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 9, (1, 6, 3)))
        mod = zoo.EdgeConv((8, 12))
        params = mod.init(jax.random.PRNGKey(0), q, s, idx)
        out = mod.apply(params, q, s, idx)
        assert out.shape == (1, 6, 12)
        # masking one neighbor changes nothing if it wasn't the max... at
        # minimum it keeps shapes/finiteness with partial masks
        m = jnp.asarray(rng.rand(1, 6, 3) > 0.3)
        out2 = mod.apply(params, q, s, idx, neighbor_masks=m)
        assert np.isfinite(np.asarray(out2)).all()

    def test_feature_propagate_exact_at_support(self, rng):
        s_pts = jnp.asarray(rng.randn(1, 12, 3).astype(np.float32))
        s_feats = jnp.asarray(rng.randn(1, 12, 5).astype(np.float32))
        mod = zoo.FeaturePropagate(())
        params = mod.init(jax.random.PRNGKey(0), s_pts, s_pts, None, s_feats)
        out = np.asarray(mod.apply(params, s_pts, s_pts, None, s_feats))
        # query == support: 1/(0+1e-5) dominates -> interp ~= own features
        np.testing.assert_allclose(out, np.asarray(s_feats), atol=1e-2)

    def test_pnconv_saconv_gsaconv(self, rng):
        g = jnp.asarray(rng.randn(1, 6, 4, 5).astype(np.float32))
        pn = zoo.PNConv((8,), (10,), normalize=True)
        params = pn.init(jax.random.PRNGKey(0), g)
        out = pn.apply(params, g)
        assert out.shape == (1, 6, 10)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                                   1.0, rtol=1e-5)
        q = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(1, 12, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(1, 12, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 12, (1, 6, 4)))
        sa = zoo.SAConv((8, 16))
        params = sa.init(jax.random.PRNGKey(0), q, s, f, idx)
        out = sa.apply(params, q, s, f, idx)
        assert out.shape == (1, 6, 16)
        gsa = zoo.GSAConv((8,))
        params = gsa.init(jax.random.PRNGKey(0), s, f)
        out = gsa.apply(params, s, f)
        assert out.shape == (1, 8)

    def test_basic_conv_res_block(self, rng):
        x = jnp.asarray(rng.randn(1, 16, 16, 6).astype(np.float32))
        blk = zoo.BasicConvResBlock(12, stride=2)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        assert out.shape == (1, 8, 8, 12)
        blk2 = zoo.BasicConvResBlock(6)     # identity shortcut path
        params = blk2.init(jax.random.PRNGKey(0), x)
        assert blk2.apply(params, x).shape == x.shape

    def test_xconv_forward(self, rng):
        q = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(1, 16, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(1, 16, 6).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 16, (1, 8, 4)))
        mod = zoo.XConv(output_dim=20, hidden_dim=8, kernel_size=4)
        params = mod.init(jax.random.PRNGKey(0), q, s, f, idx)
        out = mod.apply(params, q, s, f, idx)
        assert out.shape == (1, 8, 20)
        mod_g = zoo.XConv(output_dim=20, hidden_dim=8, kernel_size=4,
                          with_global=True)
        params = mod_g.init(jax.random.PRNGKey(0), q, s, f, idx)
        out = mod_g.apply(params, q, s, f, idx)
        assert out.shape == (1, 8, 25)


class TestPri3D:
    @pytest.mark.parametrize("depth,multires", [(10, False), (18, True)])
    def test_resunet(self, rng, depth, multires):
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        m = zoo.ResUNet(output_channel=4, depth=depth, multires=multires)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        if multires:
            out4, out3 = out
            assert out4.shape == (1, 32, 32, 4)
            assert out3.shape == (1, 16, 16, 4)
        else:
            assert out.shape == (1, 32, 32, 4)


class TestKPConvFPN:
    def test_forward_on_pyramid(self):
        from diffreg_tpu.data import synthetic_batch

        batch, spec, _ = synthetic_batch(batch_size=1, n_points=96, seed=0)
        # adapt the flagship pyramid batch into the generic dict form
        pyr = {
            "points": [batch.points[i] for i in range(len(batch.points))],
            "masks": [batch.masks[i] for i in range(len(batch.masks))],
            "neighbors": list(batch.neighbors),
            "pools": list(batch.pools),
            "upsamples": list(batch.upsamples),
            "features": batch.features,
        }
        # exercise the reference default shape (4 encoder / 2 decoder,
        # kpconv_fpn.py) and a deeper decoder
        for n_enc, n_dec in ((4, 2), (3, 2)):
            n_enc = min(n_enc, len(pyr["points"]))
            cfg = zoo.KPConvFPNConfig(input_dim=pyr["features"].shape[-1],
                                      output_dim=32, first_dim=8,
                                      encoder_stages=n_enc,
                                      decoder_stages=n_dec)
            m = zoo.KPConvFPN(cfg)
            params = m.init(jax.random.PRNGKey(0), pyr)
            outs = m.apply(params, pyr)
            assert len(outs) == n_dec       # finest-first decoder levels
            assert outs[0].shape[-1] == 32  # last decoder = output_dim Dense
            assert all(np.isfinite(np.asarray(o)).all() for o in outs)
