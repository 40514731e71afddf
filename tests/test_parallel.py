"""Sharding tests on the virtual 8-device CPU mesh (conftest sets the flag)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_matches_single_device():
    """Data-parallel train step == single-device step on the same batch."""
    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine import LossConfig, OptimConfig, create_train_state, make_train_step
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_tiny
    from diffreg_tpu.parallel import make_mesh, make_parallel_train_step, replicate, shard_batch

    batch, _, _ = synthetic_batch(batch_size=4, n_points=48, seed=0)
    cfg = preset_tiny("3dmatch", sample_steps=1)
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(0)
    ocfg = OptimConfig(optimizer="adam", lr=1e-4)
    state = create_train_state(model, batch, rng, ocfg)

    # single device
    step1 = jax.jit(make_train_step(model, LossConfig(), ocfg))
    s1, info1 = step1(state, batch, rng)

    # 4-device mesh
    mesh = make_mesh(jax.devices()[:4])
    stepN = make_parallel_train_step(model, LossConfig(), ocfg, mesh)
    sN, infoN = stepN(replicate(state, mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(info1["loss"]), float(infoN["loss"]), rtol=2e-4)
    # parameters after the step agree (gradient all-reduce correct)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1.params, sN.params)
    assert max(jax.tree.leaves(d)) < 2e-4


@pytest.mark.slow
def test_2d3d_sharded_matches_single_device():
    """2D-3D data-parallel train step == single-device step on the same
    batch (the reference auto-DDPs this trainer, vision3d/engine/
    base_trainer.py:196-210)."""
    from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
    from diffreg_tpu.engine import LossConfig, OptimConfig
    from diffreg_tpu.engine.losses2d3d import CircleLossConfig
    from diffreg_tpu.engine.train2d3d import (
        create_train_state_2d3d,
        make_train_step_2d3d,
    )
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig
    from diffreg_tpu.parallel import (
        make_mesh,
        make_parallel_train_step_2d3d,
        replicate,
        shard_batch,
    )

    batch = synthetic_2d3d_batch(batch_size=4, img_hw=(32, 48), n_points=160,
                                 seed=0)
    cfg = Pipeline2D3DConfig(
        img_out_dim=32, img_base_dim=16,
        pcd_backbone=PointBackboneConfig(output_dim=32, init_dim=16,
                                         init_radius=0.1, init_sigma=0.08),
        hidden_dim=64, output_dim=64, num_heads=2,
        matching=MatchingConfig(feature_dim=64), sample_steps=1)
    model = DiffReg2D3D(cfg)
    rng = jax.random.PRNGKey(0)
    ocfg = OptimConfig(optimizer="adam", lr=1e-4)
    state = create_train_state_2d3d(model, batch, rng, ocfg)

    step1 = jax.jit(make_train_step_2d3d(model, CircleLossConfig(),
                                         LossConfig(), ocfg))
    s1, info1 = step1(state, batch, rng)

    mesh = make_mesh(jax.devices()[:4])
    stepN = make_parallel_train_step_2d3d(model, CircleLossConfig(),
                                          LossConfig(), ocfg, mesh)
    sN, infoN = stepN(replicate(state, mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(info1["loss"]), float(infoN["loss"]),
                               rtol=2e-4)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     s1.params, sN.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_shard_order_for_process_distributed_sampler_semantics():
    """Equal-length lockstep shards whose union covers the dataset, with the
    same shuffle on every host (torch DistributedSampler semantics —
    reference vision3d/utils/dataloader.py:80-109)."""
    from diffreg_tpu.parallel.distributed import shard_order_for_process

    order = np.random.RandomState(3).permutation(13)
    shards = [shard_order_for_process(order, i, 4) for i in range(4)]
    # equal length (lockstep), padded by wrap-around: ceil(13/4) == 4
    assert all(len(s) == 4 for s in shards)
    # union covers every sample
    assert set(np.concatenate(shards).tolist()) == set(range(13))
    # only the wrap padding duplicates (16 - 13 == 3 dups)
    flat = np.concatenate(shards)
    assert len(flat) - len(set(flat.tolist())) == 3
    # no-op for a single process, even length untouched
    np.testing.assert_array_equal(shard_order_for_process(order, 0, 1), order)
    even = np.arange(12)
    assert sum(len(shard_order_for_process(even, i, 4)) for i in range(4)) == 12

    with pytest.raises(ValueError):
        shard_order_for_process(order, 4, 4)


def test_iterate_batches_shards_by_process():
    """Two simulated hosts build disjoint (mod wrap-pad) halves of an epoch,
    deterministically from the same seed."""
    from diffreg_tpu.data.datasets import iterate_batches
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.data import make_pair
    from diffreg_tpu.data.calibrate import calibrate_spec

    rng = np.random.RandomState(0)

    class TinyDS:
        def __init__(self, n):
            self.pairs = []
            for i in range(n):
                src, tgt, rot, trn = make_pair(np.random.RandomState(i), 96)[:4]
                self.pairs.append({"src_pcd": src, "tgt_pcd": tgt,
                                   "rot": rot, "trn": trn, "idx": i})

        def __len__(self):
            return len(self.pairs)

        def __getitem__(self, i):
            return self.pairs[i]

    ds = TinyDS(6)
    pcfg = PyramidConfig(first_subsampling_dl=0.05, coarse_match_radius=0.1)
    spec = calibrate_spec([(ds[i]["src_pcd"], ds[i]["tgt_pcd"]) for i in range(2)],
                          pcfg, k_cap=20)

    def epoch_indices(pi, pc):
        seen = []
        for _, metas in iterate_batches(ds, spec, pcfg, batch_size=1,
                                        shuffle=True, seed=7,
                                        process_index=pi, process_count=pc):
            seen.extend(m["idx"] for m in metas)
        return seen

    h0, h1 = epoch_indices(0, 2), epoch_indices(1, 2)
    assert len(h0) == len(h1) == 3
    assert set(h0).isdisjoint(h1)
    assert set(h0) | set(h1) == set(range(6))
    # same shuffle on every "host": repeat run is identical
    assert epoch_indices(0, 2) == h0


def test_lr_scales_by_world_size():
    from diffreg_tpu.utils.config import build_optim_config

    raw = {"optimizer": "adam", "lr": 1e-4}
    assert build_optim_config(raw, world_size=1).lr == pytest.approx(1e-4)
    assert build_optim_config(raw, world_size=4).lr == pytest.approx(4e-4)
    raw["scale_lr_by_world"] = False
    assert build_optim_config(raw, world_size=4).lr == pytest.approx(1e-4)
