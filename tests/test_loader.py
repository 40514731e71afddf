"""Parallel host loader: ordered parallel map, prefetch, drop accounting."""
import numpy as np
import pytest

from diffreg_tpu.data.loader import parallel_map_iter, prefetch_iter


def test_parallel_map_preserves_order():
    import time

    def slow_sq(x):
        time.sleep(0.002 * (x % 3))
        return x * x

    got = list(parallel_map_iter(slow_sq, range(40), num_workers=4))
    assert got == [x * x for x in range(40)]


def test_parallel_map_propagates_errors_in_order():
    def f(x):
        if x == 5:
            raise ValueError("boom")
        return x

    it = parallel_map_iter(f, range(10), num_workers=3)
    for i in range(5):
        assert next(it) == i
    with pytest.raises(ValueError):
        next(it)


def test_prefetch_iter_yields_all_and_reraises():
    assert list(prefetch_iter(iter(range(100)), buffer_size=3)) == list(range(100))

    def bad():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch_iter(bad(), buffer_size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_iterate_batches_counts_drops():
    from diffreg_tpu.data.batch import ShapeSpec
    from diffreg_tpu.data.datasets import iterate_batches
    from diffreg_tpu.data.pyramid import PyramidConfig

    rng = np.random.RandomState(0)

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            # every other pair is far too large for the tiny bucket
            n = 64 if i % 2 == 0 else 5000
            return {"src_pcd": rng.rand(n, 3).astype(np.float32),
                    "tgt_pcd": rng.rand(n, 3).astype(np.float32),
                    "rot": np.eye(3, dtype=np.float32),
                    "trn": np.zeros((3, 1), np.float32)}

    cfg = PyramidConfig(first_subsampling_dl=0.08, num_levels=3, coarse_level=-1)
    spec = ShapeSpec(n_points=(256, 256, 256), k_neighbors=(8, 8, 8),
                     k_pools=(8, 8), k_upsamples=(4, 4),
                     n_src=128, n_tgt=128, n_gt_matches=64)
    stats = {}
    batches = list(iterate_batches(DS(), spec, cfg, batch_size=2,
                                   num_workers=2, stats=stats))
    assert stats["pairs_dropped"] == 3
    assert stats["pairs_used"] == 3
    assert sum(b[0].src_mask.shape[0] for b in batches) == 3
