"""Tests: FPS, random choice, PLY IO, distributed helpers, profiling."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.ops.sampling import farthest_point_sampling, random_choice
from diffreg_tpu.utils.ply import read_ply, write_ply


class TestFPS:
    def test_spreads_points(self, rng):
        pts = rng.rand(200, 3).astype(np.float32)
        idx, mask = farthest_point_sampling(jnp.asarray(pts), jnp.ones(200, bool), 16)
        idx = np.asarray(idx)
        assert len(set(idx.tolist())) == 16
        # FPS min pairwise distance should beat random sampling's
        sel = pts[idx]
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        d[np.arange(16), np.arange(16)] = 9
        rand_sel = pts[rng.permutation(200)[:16]]
        dr = np.linalg.norm(rand_sel[:, None] - rand_sel[None], axis=-1)
        dr[np.arange(16), np.arange(16)] = 9
        assert d.min() > dr.min()

    def test_respects_validity(self, rng):
        pts = rng.rand(64, 3).astype(np.float32)
        pts[32:] += 100.0  # far away but invalid
        valid = np.arange(64) < 32
        idx, mask = farthest_point_sampling(jnp.asarray(pts), jnp.asarray(valid), 8)
        assert np.asarray(idx).max() < 32

    def test_fewer_valid_than_samples(self, rng):
        pts = rng.rand(16, 3).astype(np.float32)
        valid = np.arange(16) < 4
        idx, mask = farthest_point_sampling(jnp.asarray(pts), jnp.asarray(valid), 8)
        assert int(mask.sum()) == 4

    def test_random_choice_valid_only(self, rng):
        valid = np.zeros(32, bool)
        valid[10:20] = True
        idx = random_choice(jax.random.PRNGKey(0), 32, 64, jnp.asarray(valid))
        assert np.asarray(jnp.asarray(valid)[idx]).all()


class TestPly:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.rand(50, 3).astype(np.float32)
        inten = rng.rand(50).astype(np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply(p, [pts, inten], ["x", "y", "z", "intensity"])
        data = read_ply(p)
        np.testing.assert_allclose(
            np.stack([data["x"], data["y"], data["z"]], 1), pts, rtol=1e-6)
        np.testing.assert_allclose(data["intensity"], inten, rtol=1e-6)

    def test_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.rand(10, 3).astype(np.float32)
        p = str(tmp_path / "cloud_ascii.ply")
        write_ply(p, [pts], ["x", "y", "z"], binary=False)
        data = read_ply(p)
        np.testing.assert_allclose(
            np.stack([data["x"], data["y"], data["z"]], 1), pts, rtol=1e-5)


class TestDistributedHelpers:
    def test_single_process_defaults(self):
        from diffreg_tpu.parallel.distributed import is_master, per_host_slice, setup_distributed

        info = setup_distributed()
        assert info["process_count"] == 1
        assert is_master()
        idx = per_host_slice(np.arange(10))
        np.testing.assert_array_equal(idx, np.arange(10))


class TestProfiling:
    def test_device_timer(self):
        from diffreg_tpu.utils.profiling import DeviceTimer

        x = jnp.ones((256, 256))
        y = x @ x
        with DeviceTimer("mm", sync_value=y) as t:
            pass
        assert t.elapsed >= 0.0

    def test_runtime_profiler_feeds_timers(self):
        from diffreg_tpu.utils.logging import Timers
        from diffreg_tpu.utils.profiling import runtime_profiler

        timers = Timers()
        with runtime_profiler("block", timers):
            sum(range(1000))
        assert timers.meters["block"].count == 1


class TestSuperpointProposals:
    def test_threshold_decay_and_selection(self, rng):
        import jax
        from diffreg_tpu.ops.select import superpoint_proposals

        n = 64
        src = jnp.arange(n, dtype=jnp.int32)
        tgt = jnp.arange(n, dtype=jnp.int32)[::-1].astype(jnp.int32)
        ov = jnp.asarray(rng.rand(n).astype(np.float32) * 0.2)  # all < 0.3
        valid = jnp.asarray(np.arange(n) < 48)
        s, t, o, v = superpoint_proposals(src, tgt, ov, valid, 16,
                                          jax.random.PRNGKey(0),
                                          overlap_threshold=0.3)
        # threshold decayed until candidates pass; selections come from the
        # valid set and carry their overlaps
        assert bool(v.any())
        sn, on = np.asarray(s)[np.asarray(v)], np.asarray(o)[np.asarray(v)]
        for si, oi in zip(sn, on):
            assert si < 48
            np.testing.assert_allclose(oi, float(ov[si]), atol=1e-6)

    def test_no_replacement(self, rng):
        import jax
        from diffreg_tpu.ops.select import superpoint_proposals

        src = jnp.arange(32, dtype=jnp.int32)
        ov = jnp.asarray(rng.rand(32).astype(np.float32) * 0.5 + 0.4)
        valid = jnp.ones(32, bool)
        s, _, _, v = superpoint_proposals(src, src, ov, valid, 8,
                                          jax.random.PRNGKey(1))
        sel = np.asarray(s)[np.asarray(v)]
        assert len(set(sel.tolist())) == len(sel)
