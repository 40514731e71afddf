"""Native C++ data-pipeline library vs numpy/scipy oracles."""
import numpy as np
import pytest

from diffreg_tpu.data.native import (
    grid_subsample_native,
    native_available,
    radius_neighbors_native,
)
from diffreg_tpu.ops.neighbors import radius_neighbors_np
from diffreg_tpu.ops.subsample import grid_subsample_np

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")


def test_grid_subsample_matches_numpy(rng):
    pts = rng.rand(3000, 3).astype(np.float32) * 2
    a = grid_subsample_native(pts, 0.07)
    b = grid_subsample_np(pts, 0.07)
    assert len(a) == len(b)
    np.testing.assert_allclose(a[np.lexsort(a.T)], b[np.lexsort(b.T)], atol=1e-5)


def test_radius_search_matches_scipy(rng):
    q = rng.rand(400, 3).astype(np.float32)
    s = rng.rand(1500, 3).astype(np.float32)
    k, r = 16, 0.12
    a = radius_neighbors_native(q, s, r, k)
    b = radius_neighbors_np(q, s, r, k)
    for i in range(len(q)):
        assert set(a[i][a[i] < 1500]) == set(b[i][b[i] < 1500])
        # sorted ascending by distance
        real = a[i][a[i] < 1500]
        d = np.linalg.norm(s[real] - q[i], axis=1)
        assert np.all(np.diff(d) >= -1e-6)


def test_radius_search_empty_support(rng):
    q = rng.rand(5, 3).astype(np.float32)
    out = radius_neighbors_native(q, np.zeros((0, 3), np.float32), 0.1, 4)
    assert (out == 0).all()


def test_grid_subsample_single_point():
    out = grid_subsample_native(np.array([[1.0, 2.0, 3.0]], np.float32), 0.1)
    np.testing.assert_allclose(out, [[1, 2, 3]])
