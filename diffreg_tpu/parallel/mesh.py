"""Device mesh + sharding: the ICI/DCN replacement for the reference's DDP.

The reference scales with ``torch.nn.parallel.DistributedDataParallel`` over
NCCL plus a ``DistributedSampler`` (Diff-Reg-3dmatch/main.py:44-47,83-86,
125-129; vision3d/utils/distributed.py:11-75). Here the same capability is
expressed the XLA way:

  * one ``jax.sharding.Mesh`` with a ``data`` axis (extensible to a
    ``model`` axis for sharding the NxM matching matrix if superpoint counts
    ever outgrow a chip — SURVEY.md §2.4);
  * batches are placed with ``NamedSharding(P('data', ...))``; parameters
    and optimizer state are replicated;
  * ``jit`` compiles one SPMD program; gradient all-reduce over ICI is
    inserted by XLA — no hand-written collectives;
  * metric reduction = ``jnp.mean`` of the sharded per-pair metrics, which
    XLA lowers to a psum (== vision3d ``all_reduce_tensors`` semantics).

Multi-host: call ``jax.distributed.initialize`` before building the mesh;
per-host data loading feeds each process its slice of the global batch
(replaces DistributedSampler).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for a PairBatch pytree: leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every leaf of the batch with its leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_parallel_train_step(model, loss_cfg, optim_cfg, mesh: Mesh,
                             axis_name: str = "data"):
    """Jit the train step with batch sharded over the data axis.

    Parameters/optimizer state are replicated; XLA inserts the gradient
    all-reduce. Returns a function (state, batch, rng) -> (state, info).
    """
    from ..engine.train import make_train_step

    step = make_train_step(model, loss_cfg, optim_cfg)
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
    )


def make_parallel_train_step_2d3d(model, circle_cfg, focal_cfg, optim_cfg,
                                  mesh: Mesh, fine_cfg=None,
                                  axis_name: str = "data"):
    """Data-parallel train step for the 2D-3D pipeline (DiffReg2D3D).

    The reference auto-DDPs this exact trainer (vision3d/engine/
    base_trainer.py:196-210 wraps the model in DistributedDataParallel
    whenever the world size > 1); here the same capability is the one SPMD
    jit: batch leaves sharded over the ``data`` axis, params/optimizer
    replicated, XLA inserting the gradient all-reduce over ICI.
    """
    from ..engine.train2d3d import make_train_step_2d3d

    step = make_train_step_2d3d(model, circle_cfg, focal_cfg, optim_cfg,
                                fine_cfg=fine_cfg)
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
    )


def make_parallel_eval_step(model, mesh: Mesh, axis_name: str = "data",
                            mode: str = "ddim"):
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def eval_step(variables, batch, rng):
        return model.apply(variables, batch, rng, mode=mode)

    return jax.jit(eval_step, in_shardings=(rep, data, rep), out_shardings=data)
