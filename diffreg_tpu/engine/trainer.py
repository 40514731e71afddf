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


class CycleIterator:
    """Endless iterator over a restartable loader (vision3d
    iter_based_trainer.py:14-38 CycleLoader): when the underlying epoch
    iterator is exhausted it is rebuilt with the next epoch index (so
    shuffling/sharding that keys off the epoch keeps advancing)."""

    def __init__(self, make_iter: Callable[[int], Iterable], epoch: int = 0):
        self.make_iter = make_iter
        self.epoch = epoch
        self._it = iter(make_iter(epoch))

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self._it = iter(self.make_iter(self.epoch))
            return next(self._it)


class IterBasedTrainer(Trainer):
    """Iteration-based trainer (vision3d/engine/iter_based_trainer.py:41-128):
    every pseudo-epoch is a fixed ``num_iters_per_epoch`` pulled from a
    cycling loader; checkpoints/validation run per pseudo-epoch. Gradient
    accumulation and the non-finite-grad skip live inside the optax chain
    exactly as in the epoch-based trainer."""

    def __init__(self, *args, num_iters_per_epoch: int = 1000, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_iters_per_epoch = num_iters_per_epoch

    def train(self):
        loader = CycleIterator(self.make_train_iter, self.start_epoch)
        step_count = self.start_epoch * self.num_iters_per_epoch
        for epoch in range(self.start_epoch, self.cfg.max_epoch):
            board = SummaryBoard()
            for _ in range(self.num_iters_per_epoch):
                batch, _meta = next(loader)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, info = self.train_step(self.state, batch, step_rng)
                info = {k: (np.asarray(v) if np.ndim(v) == 0 else v)
                        for k, v in info.items()}
                board.update({k: v for k, v in info.items() if np.ndim(v) == 0})
                step_count += 1
                if step_count % self.cfg.log_every == 0:
                    self.logger.info(
                        f"iter-epoch {epoch} step {step_count}: "
                        f"{board.format(['loss'])}")
                    self.logger.metrics(step_count, board.summary(), prefix="train/")
            metrics = board.summary()
            if self.make_val_iter is not None and self.val_step is not None:
                val = self.validate(epoch)
                metrics.update({f"val_{k}": v for k, v in val.items()})
                self.logger.metrics(step_count, val, prefix="val/")
            self.ckpt.save(epoch + 1, self.state, metrics)
        return self.state


class BatchTester:
    """Batched test loop with per-sample evaluation (vision3d/engine/
    batch_tester.py:16-70). The TPU idiom inverts the reference's structure:
    ``forward`` runs once per BATCH on device (jitted by the caller), then
    ``eval_sample(i, batch, out)`` scores each sample on host; the summary
    board aggregates per-sample rows. Diff-Reg's concrete testers
    (ThreeDMatchTester, TwoDThreeDTester) specialize this pattern inline;
    this generic twin serves library users porting other vision3d models."""

    def __init__(self, forward: Callable, eval_sample: Callable,
                 batch_size_of: Callable = None,
                 logger: Optional[Logger] = None):
        self.forward = forward
        self.eval_sample = eval_sample
        self.batch_size_of = batch_size_of or (lambda b: jax.tree.leaves(b)[0].shape[0])
        self.logger = logger or Logger(None)

    def test(self, make_iter: Callable[[], Iterable], rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        board = SummaryBoard()
        n = 0
        for batch, meta in make_iter():
            rng, r1 = jax.random.split(rng)
            out = self.forward(batch, r1)
            for i in range(self.batch_size_of(batch)):
                row = self.eval_sample(i, batch, out,
                                       meta[i] if meta is not None else None)
                board.update({k: float(v) for k, v in row.items()})
                n += 1
        summary = board.summary()
        summary["samples"] = n
        self.logger.info(f"batch test: {summary}")
        return summary
