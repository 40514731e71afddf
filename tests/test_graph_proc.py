"""Deformable-scene graph utilities (native diffreg_graph) — property tests
against numpy oracles + a full depth->mesh->graph pipeline run."""
import numpy as np
import pytest

graph = pytest.importorskip("diffreg_tpu.data.graph")


@pytest.fixture(scope="module")
def point_image():
    """Smooth synthetic depth with a hole, back-projected to camera space."""
    rng = np.random.RandomState(0)
    h, w = 32, 40
    base = rng.rand(4, 5) * 0.3 + 1.0
    depth = np.kron(base, np.ones((8, 8))).astype(np.float32)
    depth[10:16, 12:20] = 0.0                       # invalid hole
    fx = fy = 40.0
    cx, cy = w / 2, h / 2
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = (uu - cx) * depth / fx
    y = (vv - cy) * depth / fy
    return np.stack([x, y, depth], -1).astype(np.float32)


class TestDepthToMesh:
    def test_mesh_properties(self, point_image):
        verts, faces, pixels = graph.depth_to_mesh(point_image, 0.5)
        h, w, _ = point_image.shape
        assert len(verts) > 0 and len(faces) > 0
        # faces index valid vertices
        assert faces.min() >= 0 and faces.max() < len(verts)
        # vertices carry their pixels' 3D positions
        for i in range(0, len(verts), 37):
            x, y = pixels[i]
            np.testing.assert_allclose(verts[i], point_image[y, x], atol=1e-6)
        # no vertex from the invalid hole
        zs = verts[:, 2]
        assert (zs > 0).all()

    def test_edge_length_limit(self, point_image):
        verts, faces, _ = graph.depth_to_mesh(point_image, 0.08)
        for f in faces[:: max(1, len(faces) // 50)]:
            a, b, c = verts[f]
            assert np.linalg.norm(a - b) <= 0.08 + 1e-6
            assert np.linalg.norm(a - c) <= 0.08 + 1e-6
            assert np.linalg.norm(b - c) <= 0.08 + 1e-6


class TestErodeSampleEdges:
    def test_erosion_shrinks_boundary(self, point_image):
        verts, faces, _ = graph.depth_to_mesh(point_image, 0.5)
        mask0 = graph.erode_mesh(verts, faces, n_iterations=0, min_neighbors=4)
        mask2 = graph.erode_mesh(verts, faces, n_iterations=2, min_neighbors=4)
        assert mask2.sum() < mask0.sum()
        assert (mask2 <= mask0).all()       # erosion only removes

    def test_sample_nodes_coverage(self, point_image):
        verts, faces, _ = graph.depth_to_mesh(point_image, 0.5)
        pos, idx = graph.sample_nodes(verts, node_coverage=0.1, seed=3,
                                      use_only_non_eroded=False)
        assert len(pos) > 1
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 0.1                # coverage separation
        np.testing.assert_allclose(pos, verts[idx], atol=1e-6)

    def test_geodesic_edges(self, point_image):
        verts, faces, _ = graph.depth_to_mesh(point_image, 0.5)
        pos, idx = graph.sample_nodes(verts, node_coverage=0.08, seed=0,
                                      use_only_non_eroded=False)
        valid = np.ones(len(verts), bool)
        edges, weights, dists, n2v = graph.compute_edges_geodesic(
            verts, valid, faces, idx, max_neighbors=4, node_coverage=0.08)
        k = len(idx)
        assert edges.shape == (k, 4)
        # listed neighbors are other nodes, distances ascending, weights normalized
        for i in range(k):
            row = edges[i][edges[i] >= 0]
            assert all(r != i for r in row)
            rd = dists[i][: len(row)]
            assert (np.diff(rd) >= -1e-6).all()
            if len(row):
                np.testing.assert_allclose(weights[i][: len(row)].sum(), 1.0,
                                           atol=1e-5)
        # node-to-vertex distance of the node's own vertex is 0
        for i in range(k):
            assert n2v[i, idx[i]] == 0.0
        # geodesic >= euclidean
        for i in range(k):
            for j, nb in enumerate(edges[i]):
                if nb < 0:
                    continue
                eu = np.linalg.norm(pos[i] - pos[nb])
                assert dists[i, j] >= eu - 1e-5

    def test_euclidean_edges_match_numpy(self, rng):
        nodes = rng.rand(40, 3).astype(np.float32)
        edges = graph.compute_edges_euclidean(nodes, max_neighbors=5,
                                              max_influence=1e9)
        d = np.linalg.norm(nodes[:, None] - nodes[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        ref = np.argsort(d, axis=1)[:, :5]
        # same neighbor SETS (ties may reorder)
        for i in range(len(nodes)):
            assert set(edges[i].tolist()) == set(ref[i].tolist())


class TestCleanupClusters:
    def test_cleanup_removes_leaves(self):
        # chain 0-1-2-3 plus isolated 4: ends have 1 neighbor -> all removed
        edges = np.array([[1, -1], [0, 2], [1, 3], [2, -1], [-1, -1]], np.int32)
        mask = graph.node_and_edge_clean_up(edges, np.ones(5, bool))
        assert not mask.any()

    def test_cleanup_keeps_triangle(self):
        edges = np.array([[1, 2], [0, 2], [0, 1], [-1, -1]], np.int32)
        mask = graph.node_and_edge_clean_up(edges, np.ones(4, bool))
        assert mask[:3].all() and not mask[3]

    def test_clusters(self):
        edges = np.array([[1, -1], [0, -1], [3, -1], [2, -1], [-1, -1]], np.int32)
        ids, sizes = graph.compute_clusters(edges)
        assert ids[0] == ids[1] and ids[2] == ids[3]
        assert ids[0] != ids[2] and ids[4] not in (ids[0], ids[2])
        assert sorted(sizes) == [1, 2, 2]


class TestAnchors:
    def test_euclidean_pixel_anchors(self, point_image):
        nodes = point_image.reshape(-1, 3)
        nodes = nodes[nodes[:, 2] > 0][:: 50]
        anchors, weights = graph.compute_pixel_anchors_euclidean(
            nodes, point_image, num_anchors=4, node_coverage=0.1)
        h, w, _ = point_image.shape
        valid_px = point_image[..., 2] > 0
        # anchored pixels have normalized weights; invalid pixels untouched
        sums = weights.sum(-1)
        np.testing.assert_allclose(sums[valid_px], 1.0, atol=1e-5)
        assert (anchors[~valid_px] == -1).all()
        # the nearest node is the first anchor
        y, x = np.argwhere(valid_px)[10]
        d = np.linalg.norm(nodes - point_image[y, x], axis=-1)
        assert anchors[y, x, 0] == int(np.argmin(d))

    def test_geodesic_pixel_anchors_sorted(self, point_image):
        verts, faces, pixels = graph.depth_to_mesh(point_image, 0.5)
        pos, idx = graph.sample_nodes(verts, node_coverage=0.08, seed=0,
                                      use_only_non_eroded=False)
        valid = np.ones(len(verts), bool)
        _, _, _, n2v = graph.compute_edges_geodesic(
            verts, valid, faces, idx, max_neighbors=4, node_coverage=0.3)
        h, w, _ = point_image.shape
        anchors, weights = graph.compute_pixel_anchors_geodesic(
            n2v, np.ones(len(idx), bool), verts, pixels, w, h,
            num_anchors=4, node_coverage=0.3)
        # anchor distances ascend per pixel (check through n2v)
        vi = 7
        x, y = pixels[vi]
        row = anchors[y, x]
        ds = [n2v[a, vi] for a in row if a >= 0]
        assert (np.diff(ds) >= -1e-6).all()

    def test_update_pixel_anchors(self):
        a = np.array([[[0, 1], [2, -1]]], np.int32)
        out = graph.update_pixel_anchors({0: 5, 1: 1, 2: 0}, a)
        np.testing.assert_array_equal(out, [[[5, 1], [0, -1]]])


class TestFPSAndDeformationGraph:
    def test_fps_matches_numpy_oracle(self, rng):
        pts = rng.rand(200, 3).astype(np.float32)
        got = graph.sample_nodes_with_fps(pts, min_distance=0.2, num_samples=-1)

        # numpy oracle of the same algorithm
        sel = [0]
        d = np.linalg.norm(pts - pts[0], axis=-1)
        alive = d >= 0.2
        while True:
            d_alive = np.where(alive, d, -1.0)
            best = int(np.argmax(d_alive))
            if d_alive[best] < 0.2:
                break
            sel.append(best)
            nd = np.linalg.norm(pts - pts[best], axis=-1)
            d = np.minimum(d, nd)
            alive = alive & (d >= 0.2)
        np.testing.assert_array_equal(got, sel)

        # min-distance property
        p = pts[got]
        dm = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(dm, np.inf)
        assert dm.min() >= 0.2

    def test_deformation_graph(self, rng):
        pts = (rng.rand(300, 3) * 0.5).astype(np.float32)
        nodes = graph.sample_nodes_with_fps(pts, min_distance=0.1)
        n_idx, n_dst, n_wgt, a_idx, a_dst, a_wgt = \
            graph.build_deformation_graph_from_point_cloud(
                pts, nodes, num_neighbors=4, num_anchors=4,
                max_distance=0.08, node_coverage=0.15)
        k = len(nodes)
        assert n_idx.shape == (k, 4) and a_idx.shape == (300, 4)
        # neighbor lists: other nodes, geodesic >= euclidean
        node_pos = pts[nodes]
        for i in range(k):
            for j, nb in enumerate(n_idx[i]):
                if nb < 0:
                    continue
                assert nb != i
                eu = np.linalg.norm(node_pos[i] - node_pos[nb])
                assert n_dst[i, j] >= eu - 1e-5
        # anchors: ascending distances, normalized weights where present
        anchored = a_idx[:, 0] >= 0
        assert anchored.sum() > 0
        for i in np.nonzero(anchored)[0][::17]:
            row = a_idx[i][a_idx[i] >= 0]
            ds = a_dst[i][: len(row)]
            assert (np.diff(ds) >= -1e-6).all()
            np.testing.assert_allclose(a_wgt[i][: len(row)].sum(), 1.0, atol=1e-5)
        # a node's own first anchor is itself at distance 0
        ni = nodes[0]
        assert a_idx[ni, 0] == 0 and a_dst[ni, 0] == 0.0
