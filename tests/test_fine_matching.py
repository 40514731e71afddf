"""Fine matching + 2D-3D end-to-end oracle tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.models.pipeline_2d3d import fine_matching, patch_pixel_table


class TestPatchPixelTable:
    def test_covers_strided_subset(self):
        t = patch_pixel_table(16, 16, 8, subsample=2)
        assert t.shape == (4, 16)
        # patch 0 contains pixels from rows 0,2,4,6 and cols 0,2,4,6
        vs, us = np.unravel_index(t[0], (16, 16))
        assert set(vs) == {0, 2, 4, 6} and set(us) == {0, 2, 4, 6}


class TestFineMatchingOracle:
    def test_recovers_known_pixel_point_pairs(self, rng):
        """Oracle: image features at pixel p equal point features of the 3D
        point that projects to p -> fine matching must link them."""
        h, w, c = 16, 16, 32
        stride = 8
        n0 = 40

        # random distinctive features per fine point
        pcd_feats = rng.randn(n0, c).astype(np.float32)
        pcd_feats /= np.linalg.norm(pcd_feats, axis=1, keepdims=True)

        # assign each point a unique pixel in the strided grid
        table = patch_pixel_table(h, w, stride, subsample=2)
        all_pix = np.unique(table.reshape(-1))
        chosen = rng.permutation(len(all_pix))[:n0]
        pix_of_point = all_pix[chosen]

        img_feats = np.zeros((h * w, c), np.float32)
        img_feats[pix_of_point] = pcd_feats
        img_feats += rng.randn(h * w, c).astype(np.float32) * 0.01

        img_points = rng.rand(h * w, 3).astype(np.float32)
        grid = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                        -1).reshape(-1, 2).astype(np.float32)
        pcd_points = rng.rand(n0, 3).astype(np.float32)

        # nodes: 4 nodes, each owning 10 points; patches: node i <-> patch of
        # its pixels — build coarse corrs linking node i to the patch that
        # holds most of its pixels
        knn_idx = np.arange(n0).reshape(4, 10)
        knn_idx = np.concatenate([knn_idx, np.full((4, 6), n0)], axis=1).astype(np.int32)
        knn_msk = knn_idx < n0

        # coarse corr: every node against every patch (let matching decide)
        c_src, c_tgt = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        c_src = c_src.reshape(-1).astype(np.int32)
        c_tgt = c_tgt.reshape(-1).astype(np.int32)
        c_val = np.ones(16, bool)

        out = fine_matching(
            jnp.asarray(img_feats.reshape(h, w, c)), jnp.asarray(img_points),
            jnp.asarray(grid), jnp.asarray(pcd_feats), jnp.asarray(pcd_points),
            jnp.asarray(c_src), jnp.asarray(c_tgt), jnp.asarray(c_val),
            jnp.asarray(knn_idx), jnp.asarray(knn_msk), jnp.asarray(table),
            max_fine_corr=256)

        got = {(int(i), int(p)) for i, p, v in zip(
            np.asarray(out["img_corr_indices"]), np.asarray(out["pcd_corr_indices"]),
            np.asarray(out["corr_valid"])) if v}
        expected = {(int(pix_of_point[j]), j) for j in range(n0)}
        # all true pairs recovered, few spurious
        assert expected <= got, f"missing {expected - got}"
        assert len(got - expected) <= 5

    def test_no_duplicates(self, rng):
        """Dedup: identical candidates across coarse corrs appear once."""
        h, w, c = 8, 8, 4
        table = patch_pixel_table(h, w, 8, subsample=2)
        f = rng.randn(3, c).astype(np.float32)
        img_feats = np.zeros((h * w, c), np.float32)
        img_feats[[0, 2, 4]] = f
        knn = np.array([[0, 1, 2]], np.int32)
        out = fine_matching(
            jnp.asarray(img_feats.reshape(h, w, c)),
            jnp.asarray(rng.rand(h * w, 3).astype(np.float32)),
            jnp.asarray(rng.rand(h * w, 2).astype(np.float32)),
            jnp.asarray(f), jnp.asarray(rng.rand(3, 3).astype(np.float32)),
            jnp.asarray(np.zeros(4, np.int32)), jnp.asarray(np.zeros(4, np.int32)),
            jnp.asarray(np.ones(4, bool)),
            jnp.asarray(knn), jnp.asarray(np.ones((1, 3), bool)),
            jnp.asarray(table), max_fine_corr=64)
        pairs = [(int(i), int(p)) for i, p, v in zip(
            np.asarray(out["img_corr_indices"]), np.asarray(out["pcd_corr_indices"]),
            np.asarray(out["corr_valid"])) if v]
        assert len(pairs) == len(set(pairs))
        assert len(pairs) >= 3
