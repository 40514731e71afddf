"""Dataset readers: 3DMatch (Predator pkl splits) and 4DMatch (npz entries).

Re-implements the reference dataset layer (Diff-Reg-3dmatch/datasets/
_3dmatch.py:15-135, _4dmatch.py:58-146) without torch dataloaders: plain
iterable readers that yield raw pair dicts; the pyramid builder + bucketer
turn them into device batches. Parallel host loading is handled by the
native prefetcher (see diffreg_tpu.data.loader).
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Iterator, Optional

import numpy as np


def _load_cloud(path: str) -> np.ndarray:
    """Load a point cloud saved as .pth (torch), .npy or .npz['pcd']."""
    if path.endswith((".pth", ".pt")):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t, dtype=np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raise ValueError(f"unsupported cloud format: {path}")


def _random_so3(rng: np.random.RandomState, rot_factor: float = 1.0) -> np.ndarray:
    """Random rotation from zyx Euler angles in [0, 2pi/rot_factor) —
    matches the reference augmentation (_3dmatch.py:95-96)."""
    from scipy.spatial.transform import Rotation

    euler = rng.rand(3) * 2.0 * np.pi / rot_factor
    return Rotation.from_euler("zyx", euler).as_matrix().astype(np.float32)


class ThreeDMatchPairDataset:
    """Predator-format split: pkl with rot/trans/src/tgt[/gt_cov] lists.

    Yields dicts: src_pcd, tgt_pcd, rot, trn, gt_cov. Augmentation follows
    _3dmatch.py:93-106 (random SO(3) applied to one side, uniform noise).
    """

    def __init__(self, info_path: str, data_root: str, *, augment: bool = False,
                 augment_noise: float = 0.005, max_points: int = 30000,
                 rot_factor: float = 1.0, seed: int = 0):
        with open(info_path, "rb") as f:
            self.infos = pickle.load(f)
        self.data_root = data_root
        self.augment = augment
        self.augment_noise = augment_noise
        self.max_points = max_points
        self.rot_factor = rot_factor
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.infos["rot"])

    def __getitem__(self, item: int) -> dict:
        rot = np.asarray(self.infos["rot"][item], np.float32)
        trn = np.asarray(self.infos["trans"][item], np.float32).reshape(3, 1)
        gt_cov = None
        if "gt_cov" in self.infos and self.infos["gt_cov"] is not None:
            gt_cov = np.asarray(self.infos["gt_cov"][item], np.float32)

        src = _load_cloud(os.path.join(self.data_root, self.infos["src"][item]))
        tgt = _load_cloud(os.path.join(self.data_root, self.infos["tgt"][item]))

        if len(src) > self.max_points:
            src = src[self.rng.permutation(len(src))[:self.max_points]]
        if len(tgt) > self.max_points:
            tgt = tgt[self.rng.permutation(len(tgt))[:self.max_points]]

        if self.augment:
            rot_ab = _random_so3(self.rng, self.rot_factor)
            if self.rng.rand() > 0.5:
                src = src @ rot_ab.T
                rot = rot @ rot_ab.T
            else:
                tgt = tgt @ rot_ab.T
                rot = rot_ab @ rot
                trn = rot_ab @ trn
            src = src + (self.rng.rand(*src.shape).astype(np.float32) - 0.5) * self.augment_noise
            tgt = tgt + (self.rng.rand(*tgt.shape).astype(np.float32) - 0.5) * self.augment_noise

        return {"src_pcd": src.astype(np.float32), "tgt_pcd": tgt.astype(np.float32),
                "rot": rot, "trn": trn, "gt_cov": gt_cov, "scene_flow": None,
                "metric_index": None}


class FourDMatchPairDataset:
    """4DMatch: directory of .npz entries with src/tgt clouds, s2t_flow and
    metric_index (datasets/_4dmatch.py:58-146), with augmentation like the
    reference train split."""

    def __init__(self, split_dir: str, *, augment: bool = False,
                 augment_noise: float = 0.002, max_points: int = 30000,
                 rot_factor: float = 1.0, seed: int = 0):
        self.entries = sorted(glob.glob(os.path.join(split_dir, "**", "*.npz"),
                                        recursive=True))
        self.augment = augment
        self.augment_noise = augment_noise
        self.max_points = max_points
        self.rot_factor = rot_factor  # reference hardcodes 1.0 (_4dmatch.py:35)
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, item: int) -> dict:
        with np.load(self.entries[item]) as z:
            def pick(*names):
                for n in names:
                    if n in z:
                        return z[n]
                return None

            # reference entries use s_pc/t_pc (_4dmatch.py:73-74)
            src = pick("s_pc", "src_pcd_list", "src_pcd")
            tgt = pick("t_pc", "tgt_pcd_list", "tgt_pcd")
            flow = pick("s2t_flow")
            rot = pick("rot")
            trn = pick("trans")
            metric_index = pick("metric_index")

        src = np.asarray(src, np.float32)
        tgt = np.asarray(tgt, np.float32)
        flow = np.zeros_like(src) if flow is None else np.asarray(flow, np.float32)
        rot = np.eye(3, dtype=np.float32) if rot is None else np.asarray(rot, np.float32)
        trn = np.zeros((3, 1), np.float32) if trn is None \
            else np.asarray(trn, np.float32).reshape(3, 1)

        if len(src) > self.max_points:
            keep = self.rng.permutation(len(src))[:self.max_points]
            src, flow = src[keep], flow[keep]
        if len(tgt) > self.max_points:
            tgt = tgt[self.rng.permutation(len(tgt))[:self.max_points]]

        if self.augment:
            # Reference train aug (_4dmatch.py:109-123): a full random SO(3)
            # on ONE side (coin flip) with rot/trn recomposition, then
            # uniform noise on the clouds; the flow is re-derived from the
            # rotated deformed cloud, so it absorbs the -src_noise term
            # exactly as the reference does.
            deformed = src + flow
            rot_ab = _random_so3(self.rng, self.rot_factor)
            if self.rng.rand() > 0.5:
                src = src @ rot_ab.T
                deformed = deformed @ rot_ab.T
                rot = rot @ rot_ab.T
            else:
                tgt = tgt @ rot_ab.T
                rot = rot_ab @ rot
                trn = rot_ab @ trn
            src = src + (self.rng.rand(*src.shape).astype(np.float32) - 0.5) * self.augment_noise
            tgt = tgt + (self.rng.rand(*tgt.shape).astype(np.float32) - 0.5) * self.augment_noise
            flow = deformed - src

        return {"src_pcd": src, "tgt_pcd": tgt, "rot": rot, "trn": trn,
                "gt_cov": None, "scene_flow": flow,
                "metric_index": None if metric_index is None
                else np.asarray(metric_index, np.int64).squeeze()}


def iterate_batches(dataset, spec, pyr_cfg, batch_size: int, *, shuffle=False,
                    seed=0, drop_last=False, num_workers: int = 1,
                    prefetch: int = 2, stats: Optional[dict] = None,
                    process_index: int = 0, process_count: int = 1) -> Iterator:
    """Host loader: pyramid-build each pair, group into PairBatches.

    ``spec`` may be one ShapeSpec or a list of buckets (small -> large):
    each pair lands in the smallest bucket it fits; one batch is emitted per
    bucket as it fills, so XLA compiles one program per bucket (the TPU
    answer to ragged pair sizes, SURVEY.md §7 "bucketed padding").

    ``num_workers`` > 1 builds pyramids in a thread pool (the C++ kernels
    and numpy release the GIL) — the reference's ``num_workers: 8``
    equivalent (datasets/dataloader.py:600-636); ``prefetch`` batches are
    built ahead of the consumer. ``stats`` (optional dict) receives
    ``pairs_dropped`` / ``pairs_used`` counts — dropped pairs overflowed
    every bucket and are NOT silent anymore.

    ``process_index``/``process_count`` shard the (identically shuffled)
    epoch order across hosts, DistributedSampler-style — every multi-host
    process builds only its own slice of the data (reference
    Diff-Reg-3dmatch/main.py:127, vision3d/utils/dataloader.py:80-109).
    Pass ``jax.process_index()``/``jax.process_count()`` (the CLI does).
    """
    from .loader import parallel_map_iter, prefetch_iter
    from .pyramid import batch_from_samples, build_pair_pyramid

    specs = list(spec) if isinstance(spec, (list, tuple)) else [spec]
    if stats is None:
        stats = {}
    stats.setdefault("pairs_dropped", 0)
    stats.setdefault("pairs_used", 0)

    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    if process_count > 1:
        from ..parallel.distributed import shard_order_for_process

        order = shard_order_for_process(order, process_index, process_count)

    def build_one(i):
        raw = dataset[int(i)]
        for s in specs:
            try:
                sample = build_pair_pyramid(
                    raw["src_pcd"], raw["tgt_pcd"], raw["rot"], raw["trn"],
                    pyr_cfg, s, scene_flow=raw.get("scene_flow"),
                    gt_cov=raw.get("gt_cov"))
                return sample, s, raw
            except ValueError:
                continue
        return None, None, raw

    def batches():
        bufs = {id(s): [] for s in specs}
        metas = {id(s): [] for s in specs}
        for sample, used, raw in parallel_map_iter(build_one, order,
                                                   num_workers=num_workers):
            if sample is None:
                stats["pairs_dropped"] += 1
                continue  # overflows the largest bucket (now counted)
            stats["pairs_used"] += 1
            bufs[id(used)].append(sample)
            metas[id(used)].append(raw)
            if len(bufs[id(used)]) == batch_size:
                yield batch_from_samples(bufs[id(used)]), metas[id(used)]
                bufs[id(used)], metas[id(used)] = [], []
        if not drop_last:
            for s in specs:
                if bufs[id(s)]:
                    yield batch_from_samples(bufs[id(s)]), metas[id(s)]

    it = batches()
    if num_workers > 1 and prefetch > 0:
        it = prefetch_iter(it, buffer_size=prefetch)
    yield from it
