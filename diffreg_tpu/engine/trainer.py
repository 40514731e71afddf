"""Epoch-based trainer — the reference Trainer/EpochBasedTrainer equivalent.

Covers lib/trainer.py:16-290 + vision3d/engine/epoch_based_trainer.py:
epoch loop, per-step metrics boards, periodic logging, checkpoint save with
best-loss/best-recall tracking, resume. Device work is one jitted train
step; gradient accumulation/NaN handling live inside the optax chain
(engine.train). Data parallelism comes from constructing the step with a
mesh (diffreg_tpu.parallel.make_parallel_train_step).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..utils.logging import Logger, SummaryBoard, Timers
from .checkpoint import CheckpointManager
from .train import TrainState


@dataclasses.dataclass
class TrainerConfig:
    max_epoch: int = 100
    log_every: int = 100
    save_dir: str = "snapshot/run"
    keep_checkpoints: int = 5


class Trainer:
    def __init__(
        self,
        train_step: Callable,
        state: TrainState,
        make_train_iter: Callable[[int], Iterable],   # epoch -> iterator of (batch, meta)
        cfg: TrainerConfig,
        *,
        make_val_iter: Optional[Callable[[int], Iterable]] = None,
        val_step: Optional[Callable] = None,
        logger: Optional[Logger] = None,
        rng=None,
    ):
        self.train_step = train_step
        self.state = state
        self.make_train_iter = make_train_iter
        self.make_val_iter = make_val_iter
        self.val_step = val_step
        self.cfg = cfg
        self.logger = logger or Logger(cfg.save_dir)
        self.ckpt = CheckpointManager(f"{cfg.save_dir}/checkpoints", cfg.keep_checkpoints)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.timers = Timers()
        self.start_epoch = 0

    def resume(self):
        restored = self.ckpt.restore(self.state)
        if restored is not None:
            self.state = restored
            self.start_epoch = int(self.ckpt.latest_step())
            self.logger.info(f"resumed from epoch {self.start_epoch}")

    def train(self):
        step_count = 0
        for epoch in range(self.start_epoch, self.cfg.max_epoch):
            board = SummaryBoard()
            for batch, _meta in self.make_train_iter(epoch):
                self.rng, step_rng = jax.random.split(self.rng)
                self.timers.tic("train_step")
                self.state, info = self.train_step(self.state, batch, step_rng)
                # a real device->host readback: block_until_ready is a no-op
                # on the tunneled backend (ROADMAP.md), so force the loss to
                # host before stopping the step timer
                info = {k: (np.asarray(v) if np.ndim(v) == 0 else v)
                        for k, v in info.items()}
                self.timers.toc("train_step")
                board.update({k: v for k, v in info.items()
                              if np.ndim(v) == 0})
                step_count += 1
                if step_count % self.cfg.log_every == 0:
                    self.logger.info(f"epoch {epoch} step {step_count}: {board.format(['loss', 'recall_coarse'])}")
                    self.logger.metrics(step_count, board.summary(), prefix="train/")

            metrics = board.summary()
            if self.make_val_iter is not None and self.val_step is not None:
                val = self.validate(epoch)
                metrics.update({f"val_{k}": v for k, v in val.items()})
                self.logger.metrics(step_count, val, prefix="val/")
            self.ckpt.save(epoch + 1, self.state, metrics)
            self.logger.info(
                f"epoch {epoch} done: {', '.join(f'{k}={v:.4f}' for k, v in metrics.items())}")
        return self.state

    def validate(self, epoch: int):
        board = SummaryBoard()
        for batch, _meta in self.make_val_iter(epoch):
            self.rng, step_rng = jax.random.split(self.rng)
            info = self.val_step(self.state, batch, step_rng)
            board.update({k: v for k, v in info.items() if np.ndim(v) == 0})
        return board.summary()
