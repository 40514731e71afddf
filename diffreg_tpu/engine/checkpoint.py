"""Checkpoint manager — orbax-backed save/restore with best-metric tracking.

Covers the reference's two checkpoint systems (SURVEY.md §5):
  * Lepard ``Trainer._snapshot``: {epoch, state_dict, optimizer, scheduler,
    best_loss, best_recall} per epoch + model_best_* (lib/trainer.py:69-120);
  * vision3d ``CheckpointManager``: keep-last-N, best per metric
    (engine/checkpoint.py:28-162).

Layout: <dir>/<step>/... (orbax), plus a small JSON sidecar with bests.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._meta_path = os.path.join(self.directory, "best.json")
        self._best = self._load_meta()

    def _load_meta(self):
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}

    def _save_meta(self):
        with open(self._meta_path, "w") as f:
            json.dump(self._best, f, indent=2)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        """Save a pytree state; track best per metric (higher is better for
        *recall*-style names, lower for *loss*-style)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metrics:
            for name, value in metrics.items():
                value = float(value)
                higher_better = not ("loss" in name.lower())
                cur = self._best.get(name)
                better = cur is None or (value > cur["value"] if higher_better
                                         else value < cur["value"])
                if better:
                    self._best[name] = {"value": value, "step": int(step)}
            self._save_meta()
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self._mgr.latest_step()

    def best_step(self, metric: str):
        entry = self._best.get(metric)
        return None if entry is None else entry["step"]

    def close(self):
        self._mgr.close()
