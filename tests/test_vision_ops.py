"""Tests for 2D-3D vision ops: back_project/render roundtrip, patchify, partition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.ops import vision
from diffreg_tpu.ops.partition import (
    batch_mutual_topk_select,
    knn_interpolate,
    point_to_node_partition,
)


INTRINSICS = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]], np.float32)


class TestBackProjectRender:
    def test_roundtrip(self, rng):
        h, w = 48, 64
        k = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]], np.float32)
        depth = (rng.rand(h, w).astype(np.float32) + 0.5) * 2
        pts, valid = vision.back_project(jnp.asarray(depth), jnp.asarray(k))
        assert bool(valid.all())
        pixels, z, in_front = vision.render(pts, jnp.asarray(k), rounding=False)
        grid = vision.create_meshgrid(h, w, flatten=True)
        np.testing.assert_allclose(np.asarray(pixels), np.asarray(grid), atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), depth.reshape(-1), atol=1e-5)

    def test_invalid_depth_masked(self):
        depth = jnp.zeros((4, 4)).at[0, 0].set(2.0).at[1, 1].set(10.0)
        pts, valid = vision.back_project(depth, jnp.asarray(INTRINSICS), depth_limit=6.0)
        assert int(valid.sum()) == 1

    def test_render_behind_camera(self):
        pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0]])
        _, _, in_front = vision.render(pts, jnp.asarray(INTRINSICS))
        assert not bool(in_front[0]) and bool(in_front[1])


class TestPatchify:
    def test_partition_covers_all_pixels(self):
        h, w, s = 12, 16, 4
        flat, centers = vision.patchify(h, w, s)
        assert flat.shape == ((h // s) * (w // s), s * s)
        seen = np.sort(np.asarray(flat).reshape(-1))
        np.testing.assert_array_equal(seen, np.arange(h * w))

    def test_centers(self):
        flat, centers = vision.patchify(8, 8, 4)
        np.testing.assert_allclose(np.asarray(centers)[0], [1.5, 1.5])
        np.testing.assert_allclose(np.asarray(centers)[-1], [5.5, 5.5])


class TestPartition:
    def test_points_assigned_to_nearest_node(self, rng):
        nodes = rng.rand(8, 3).astype(np.float32) * 2
        points = nodes[rng.randint(0, 8, 100)] + rng.randn(100, 3).astype(np.float32) * 0.01
        part = point_to_node_partition(
            jnp.asarray(points), jnp.asarray(nodes),
            jnp.ones(100, bool), jnp.ones(8, bool), k=16)
        d = np.linalg.norm(points[:, None] - nodes[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(part.point_to_node), d.argmin(1))
        assert int(part.node_sizes.sum()) == 100
        # knn indices are members of their node
        p2n = np.asarray(part.point_to_node)
        knn = np.asarray(part.node_knn_indices)
        masks = np.asarray(part.node_knn_masks)
        for m in range(8):
            real = knn[m][masks[m]]
            assert all(p2n[i] == m for i in real)

    def test_padding(self, rng):
        nodes = rng.rand(4, 3).astype(np.float32)
        points = rng.rand(20, 3).astype(np.float32)
        pv = np.arange(20) < 10
        nv = np.arange(4) < 3
        part = point_to_node_partition(
            jnp.asarray(points), jnp.asarray(nodes), jnp.asarray(pv), jnp.asarray(nv), k=8)
        assert not bool(part.node_masks[3])
        assert int(part.node_sizes[:3].sum()) == 10


class TestKnnInterpolate:
    def test_exact_at_support_points(self, rng):
        s_pts = rng.rand(30, 3).astype(np.float32)
        s_feats = rng.randn(30, 5).astype(np.float32)
        out = knn_interpolate(jnp.asarray(s_pts), jnp.asarray(s_pts),
                              jnp.asarray(s_feats), jnp.ones(30, bool), jnp.ones(30, bool))
        np.testing.assert_allclose(np.asarray(out), s_feats, atol=1e-4)


class TestBatchMutualTopk:
    def test_matches_unbatched(self, rng):
        from diffreg_tpu.ops.select import mutual_topk_mask

        s = rng.rand(3, 10, 8).astype(np.float32)
        batched = batch_mutual_topk_select(jnp.asarray(s), 2, mutual=True)
        for b in range(3):
            single = mutual_topk_mask(jnp.asarray(s[b]), 2, mutual=True)
            np.testing.assert_array_equal(np.asarray(batched[b]), np.asarray(single))
