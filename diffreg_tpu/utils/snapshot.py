"""Run-snapshot source backup.

Twin of the reference's train-time source backup (Diff-Reg-3dmatch/
main.py:66-74: ``cp -r models configs ... lib`` + ``main.py`` into the
snapshot dir) so a training run's exact code is archived next to its
checkpoints. Here the unit of reproducibility is the ``diffreg_tpu``
package plus the repo-level ``configs/`` tree and the YAML actually used.
Master-process only under multi-host (reference guards with
``local_rank <= 0``).
"""
from __future__ import annotations

import os
import shutil

_IGNORE = shutil.ignore_patterns("__pycache__", "*.pyc", "*.so")


def backup_sources(save_dir: str, config_path: str | None = None) -> str:
    """Copy the package source + configs (+ the run's YAML) under
    ``save_dir/source_backup``. Returns the backup directory. Idempotent:
    an existing backup from a resumed run is left untouched (the code that
    STARTED the run is the one worth keeping).
    """
    dst = os.path.join(save_dir, "source_backup")
    if os.path.isdir(dst):
        return dst
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_dir = os.path.dirname(pkg_dir)
    os.makedirs(dst, exist_ok=True)
    try:
        shutil.copytree(pkg_dir, os.path.join(dst, os.path.basename(pkg_dir)),
                        ignore=_IGNORE)
        configs_dir = os.path.join(repo_dir, "configs")
        if os.path.isdir(configs_dir):
            shutil.copytree(configs_dir, os.path.join(dst, "configs"),
                            ignore=_IGNORE)
    except FileExistsError:
        # isdir-then-copytree TOCTOU: a concurrent process won the race on
        # a shared save_dir — its backup is byte-identical, keep it
        return dst
    if config_path and os.path.isfile(config_path):
        shutil.copy2(config_path, dst)
    return dst
