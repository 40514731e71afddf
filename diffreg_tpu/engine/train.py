"""Training engine: optimizer construction, jitted train step, NaN guard.

TPU-native equivalent of the reference Trainer wiring (lib/trainer.py:16-290
+ main.py optimizer/scheduler construction):
  * SGD+momentum or Adam with exponential LR decay (main.py:89-117 semantics);
  * gradient accumulation via ``optax.MultiSteps`` (== ``iter_size``);
  * the NaN/Inf gradient guard ``validate_gradient`` (lib/utils.py:96-107)
    becomes ``optax.zero_nans`` + a logged all-finite flag — no host sync;
  * data parallelism: the step function is jitted under a ``Mesh`` with the
    batch sharded over the ``data`` axis; XLA inserts the gradient psum
    (see diffreg_tpu.parallel).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core as flax_core

from .losses import LossConfig, diffreg_loss


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "sgd"          # sgd | adam
    lr: float = 0.015
    momentum: float = 0.93
    weight_decay: float = 1e-6
    scheduler_gamma: float = 0.95   # ExpLR decay per epoch
    # MUST be the real loader length for gamma^epoch parity with the
    # reference ExpLR (scheduler.step per epoch, lib/trainer.py);
    # main.py passes len(dataset)//batch_size
    steps_per_epoch: int = 1000
    grad_accum_steps: int = 1       # iter_size
    max_grad_norm: float = 0.0      # 0 = off
    # reference validate_gradient SKIPS the optimizer step on any non-finite
    # gradient (lib/utils.py:96-107, lib/trainer.py:196-200); False restores
    # the softer zero-NaNs-and-apply behavior
    skip_nonfinite_updates: bool = True
    # 'exponential' = the Lepard-branch per-epoch ExpLR (default); the
    # 'warmup_*' variants are the vision3d build_warmup_lr_scheduler family
    # (vision3d/utils/optimizer.py:13-103)
    scheduler: str = "exponential"  # exponential | warmup_exponential |
    #                                 warmup_cosine | warmup_linear
    warmup_steps: int = 0
    total_steps: int = 100000       # warmup_cosine / warmup_linear horizon
    eta_init: float = 0.1           # warmup start multiplier
    eta_min: float = 0.1            # decay floor multiplier


def warmup_annealing_schedule(kind: str, base_lr: float, warmup_steps: int,
                              total_steps: int = 0, gamma: float = 0.95,
                              step_size: int = 1000, eta_init: float = 0.1,
                              eta_min: float = 0.1):
    """vision3d WarmUp{Exponential,Cosine,Linear}AnnealingFunction as an
    optax schedule (optimizer.py:13-74): linear warmup from eta_init*lr,
    then the chosen annealing with an eta_min*lr floor."""

    def schedule(count):
        # torch LambdaLR hands the lambda last_epoch=k at update k and the
        # reference uses next_step = last_step + 1 (optimizer.py:22-24);
        # optax counts applied updates from 0, so shift by one for parity
        step = jnp.asarray(count, jnp.float32) + 1.0
        warm = eta_init + (1.0 - eta_init) / jnp.maximum(warmup_steps, 1) * step
        decay_step = step - warmup_steps
        if kind == "warmup_exponential":
            mult = jnp.maximum(
                gamma ** jnp.floor((decay_step + 1) / step_size), eta_min)
        elif kind == "warmup_cosine":
            frac = decay_step / jnp.maximum(total_steps - warmup_steps, 1)
            mult = eta_min + 0.5 * (1.0 - eta_min) * (1 + jnp.cos(jnp.pi * frac))
            mult = jnp.where(step > total_steps, eta_min, mult)
        elif kind == "warmup_linear":
            frac = decay_step / jnp.maximum(total_steps - warmup_steps, 1)
            mult = eta_min + (1.0 - eta_min) * (1.0 - frac)
            mult = jnp.where(step > total_steps, eta_min, mult)
        else:
            raise ValueError(kind)
        return base_lr * jnp.where(step < warmup_steps, warm, mult)

    return schedule


class TrainState(NamedTuple):
    params: Any
    buffers: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.scheduler == "exponential":
        sched = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=cfg.steps_per_epoch,
            decay_rate=cfg.scheduler_gamma,
            staircase=True,
        )
    else:
        sched = warmup_annealing_schedule(
            cfg.scheduler, cfg.lr, cfg.warmup_steps, cfg.total_steps,
            gamma=cfg.scheduler_gamma, step_size=cfg.steps_per_epoch,
            eta_init=cfg.eta_init, eta_min=cfg.eta_min)
    chain = [optax.zero_nans()]
    if cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.optimizer == "sgd":
        if cfg.weight_decay > 0:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.sgd(sched, momentum=cfg.momentum))
    elif cfg.optimizer == "adam":
        chain.append(optax.adamw(sched, weight_decay=cfg.weight_decay))
    else:
        raise ValueError(cfg.optimizer)
    tx = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def create_train_state(model, batch, rng, optim_cfg: OptimConfig) -> TrainState:
    variables = model.init({"params": rng}, batch, rng, mode="train")
    params = variables["params"]
    buffers = variables.get("buffers", flax_core.freeze({}))
    tx = make_optimizer(optim_cfg)
    return TrainState(params, buffers, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model, loss_cfg: LossConfig, optim_cfg: OptimConfig) -> Callable:
    tx = make_optimizer(optim_cfg)

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            outputs = model.apply(
                {"params": params, "buffers": state.buffers}, batch, rng, mode="train")
            loss, info = diffreg_loss(outputs, batch, loss_cfg)
            return loss, info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        flat = jax.tree.leaves(grads)
        grads_finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in flat]))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if optim_cfg.skip_nonfinite_updates:
            # reference validate_gradient: a NaN/Inf gradient skips the WHOLE
            # optimizer step — params, momentum, and schedule stay untouched
            # (lib/trainer.py:196-200); jnp.where keeps it a single program
            params = jax.tree.map(
                lambda new, old: jnp.where(grads_finite, new, old),
                params, state.params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(grads_finite, new, old),
                opt_state, state.opt_state)
        info = dict(info)
        info["grads_finite"] = grads_finite
        info["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(params, state.buffers, opt_state, state.step + 1)
        return new_state, info

    return train_step


def make_eval_step(model, loss_cfg: LossConfig) -> Callable:
    """Validation step: the training loss WITHOUT an optimizer update
    (reference BaseTrainer val loop, vision3d/engine/base_trainer.py:342-414)."""

    def eval_step(state: TrainState, batch, rng):
        outputs = model.apply(
            {"params": state.params, "buffers": state.buffers}, batch, rng,
            mode="train")
        loss, info = diffreg_loss(outputs, batch, loss_cfg)
        return dict(info)

    return eval_step
