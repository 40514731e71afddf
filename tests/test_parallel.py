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
