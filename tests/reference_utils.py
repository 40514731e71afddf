"""Load the reference torch Pipeline offline for conversion/parity tests.

The reference branches (Diff-Reg-3dmatch / Diff-Reg-4dmatch) import
open3d/nibabel at module level for eval-time utilities that these tests never
call; they are absent in this environment, so empty module stubs stand in.
easydict is replaced by a minimal attribute-dict. Used for validating
tools/convert_checkpoint.py against a real torch state_dict and for the
whole-pipeline parity harness (tests/test_pipeline_parity.py).

Both branches define top-level packages named ``models``/``configs``/
``datasets``/``lib``; switching branches purges those from sys.modules.
"""
from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np

REF_ROOTS = {
    "3dmatch": "/root/reference/Diff-Reg-3dmatch",
    "4dmatch": "/root/reference/Diff-Reg-4dmatch",
}
REF_ROOT = REF_ROOTS["3dmatch"]  # backward compat


class EDict(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def to_edict(d):
    if isinstance(d, dict):
        return EDict({k: to_edict(v) for k, v in d.items()})
    if isinstance(d, list):
        return [to_edict(v) for v in d]
    return d


def _purge_reference_modules():
    for mod in list(sys.modules):
        if mod.split(".")[0] in ("models", "configs", "datasets", "lib"):
            del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if not p.startswith("/root/reference")]


def load_reference_pipeline(config_path=None, seed: int = 0,
                            branch: str = "3dmatch", overrides=None):
    """Instantiate the reference Pipeline (torch, CPU) with its test config.

    Returns (pipeline, config). Reference: Diff-Reg-3dmatch/models/
    pipeline.py:130 and main.py:32-38 (yaml + !join -> edict). ``overrides``
    is an optional callable mutating the config dict before construction
    (e.g. SAMPLE_STEP or procrustes.max_condition_num).
    """
    import torch
    import yaml

    root = REF_ROOTS[branch]
    for name in ("open3d", "nibabel", "nibabel.quaternions"):
        sys.modules.setdefault(name, types.ModuleType(name))
    _purge_reference_modules()
    sys.path.insert(0, root)

    if not any(isinstance(c, str) and c == "!join"
               for c in getattr(yaml.Loader, "yaml_constructors", {})):
        yaml.add_constructor(
            "!join", lambda l, n: "_".join(str(i) for i in l.construct_sequence(n)))

    config_path = config_path or os.path.join(root, f"configs/test/{branch}.yaml")
    with open(config_path) as f:
        config = to_edict(yaml.load(f, Loader=yaml.Loader))

    from configs.models import architectures  # reference configs/models.py

    config.kpfcn_config.architecture = architectures[config.dataset]
    if overrides is not None:
        overrides(config)

    # single-threaded torch: intra-op thread partitioning changes reduction
    # order run-to-run under load, which flips ~1e-7-margin matches in the
    # DDIM parity comparison (observed 0-4 flips across identical runs)
    torch.set_num_threads(1)
    torch.manual_seed(seed)
    cwd = os.getcwd()
    os.chdir(root)  # kernel dispositions ply path is relative
    try:
        from models.pipeline import Pipeline

        pipe = Pipeline(config).eval()
    finally:
        os.chdir(cwd)
    return pipe, config


@contextlib.contextmanager
def torch_cpu_cuda_patch():
    """Make the reference's hardcoded ``.cuda()`` calls no-ops on CPU
    (pipeline.py:39,44 mutual_topk_select builds index grids with .cuda())."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


@contextlib.contextmanager
def patched_ddim_noise(x_init: np.ndarray, zero_randn_like: bool = False):
    """Pin the reference DDIM loop's randomness: the FIRST torch.randn call
    whose shape matches ``x_init`` returns it (the x initialisation at
    pipeline.py:224); optionally zero torch.randn_like (the +sigma*noise
    term kept by the 4dmatch branch, 4dmatch pipeline.py:190)."""
    import torch

    orig_randn, orig_like = torch.randn, torch.randn_like
    state = {"used": False}

    def randn(*args, **kw):
        shape = args[0] if len(args) == 1 and isinstance(args[0], (tuple, torch.Size)) \
            else args
        if not state["used"] and tuple(shape) == tuple(x_init.shape):
            state["used"] = True
            return torch.from_numpy(np.ascontiguousarray(x_init))
        return orig_randn(*args, **kw)

    def randn_like(x, **kw):
        if zero_randn_like:
            return torch.zeros_like(x)
        return orig_like(x, **kw)

    torch.randn, torch.randn_like = randn, randn_like
    try:
        yield
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like


def sample_to_reference_data(sample: dict) -> dict:
    """Convert ONE padded pyramid sample (data/pyramid.py dict, pre-stack)
    into the packed torch ``data`` dict the reference Pipeline consumes
    (collate_fn_3dmatch output schema, datasets/dataloader.py:301-325).

    Both models then see literally identical neighbor/pool/upsample tables,
    so any output divergence is a model-composition difference, not a data
    difference. Sentinel remap: ours pads with the STATIC padded size; the
    reference expects sentinel == packed REAL size per level (the shadow-row
    convention of cpp_neighbors, blocks.py:253-254).
    """
    import torch

    levels = len(sample["points"])
    n_real = [int(sample["masks"][l].sum()) for l in range(levels)]

    def remap(arr_rows, n_rows, n_support):
        a = np.asarray(arr_rows[:n_rows], np.int64)
        return torch.from_numpy(np.where(a >= n_support, n_support, a))

    data = {
        "points": [torch.from_numpy(np.ascontiguousarray(
            sample["points"][l][: n_real[l]], np.float32)) for l in range(levels)],
        "neighbors": [remap(sample["neighbors"][l], n_real[l], n_real[l])
                      for l in range(levels)],
        "pools": [remap(sample["pools"][l], n_real[l + 1], n_real[l])
                  for l in range(levels - 1)],
        "upsamples": [remap(sample["upsamples"][l], n_real[l], n_real[l + 1])
                      for l in range(levels - 1)],
        "features": torch.from_numpy(np.ascontiguousarray(
            sample["features"][: n_real[0]], np.float32)),
    }

    # coarse split (level -2): packed order is [src ++ tgt], B=1 so the
    # padded buffers equal the real sizes and the masks are all-True
    ns_c = int(sample["src_mask"].sum())
    nt_c = int(sample["tgt_mask"].sum())
    data.update({
        "src_mask": torch.ones(1, ns_c, dtype=torch.bool),
        "tgt_mask": torch.ones(1, nt_c, dtype=torch.bool),
        "src_ind_coarse": torch.arange(ns_c),
        "tgt_ind_coarse": torch.arange(nt_c) + ns_c,
        "src_ind_coarse_split": torch.arange(ns_c),
        "tgt_ind_coarse_split": torch.arange(nt_c),
        "batched_rot": torch.from_numpy(sample["rot_gt"][None].astype(np.float32)),
        "batched_trn": torch.from_numpy(sample["trn_gt"][None].astype(np.float32)),
    })

    valid = sample["gt_valid"].astype(bool)
    data["coarse_matches"] = [torch.from_numpy(np.stack(
        [sample["gt_src"][valid].astype(np.int64),
         sample["gt_tgt"][valid].astype(np.int64)]))]
    return data
