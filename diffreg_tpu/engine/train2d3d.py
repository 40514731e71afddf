"""2D-3D training step: circle + focal losses over DiffReg2D3D.

Completes the trainval.py path of the reference 2D-3D experiment
(vision3d EpochBasedTrainer + OverallLoss): same optax machinery as the
3D pipeline, loss from engine.losses2d3d.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .losses import LossConfig
from .losses2d3d import CircleLossConfig, FineLossConfig, loss_2d3d
from .train import OptimConfig, TrainState, make_optimizer


def create_train_state_2d3d(model, batch, rng, optim_cfg: OptimConfig) -> TrainState:
    variables = model.init({"params": rng}, batch, rng, mode="train")
    from flax import core as flax_core

    params = variables["params"]
    buffers = variables.get("buffers", flax_core.freeze({}))
    tx = make_optimizer(optim_cfg)
    return TrainState(params, buffers, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step_2d3d(model, circle_cfg: CircleLossConfig,
                         focal_cfg: LossConfig, optim_cfg: OptimConfig,
                         fine_cfg: FineLossConfig | None = None) -> Callable:
    tx = make_optimizer(optim_cfg)

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            out = model.apply({"params": params, "buffers": state.buffers},
                              batch, rng, mode="train")
            return loss_2d3d(out, circle_cfg, focal_cfg,
                             batch=batch, fine_cfg=fine_cfg)

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        flat = jax.tree.leaves(grads)
        grads_finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in flat]))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        info = dict(info)
        info["grads_finite"] = grads_finite
        return TrainState(params, state.buffers, opt_state, state.step + 1), info

    return train_step
