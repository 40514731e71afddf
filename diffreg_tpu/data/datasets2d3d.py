"""RGB-D Scenes V2 / 7Scenes image<->cloud pair readers.

Re-implements RGBDScenes2D3DHardPairDataset and its SevenScenes twin
(Diff-Reg-2d3d/vision3d/datasets/registration/rgbdscenes/rgbdscenes.py:
22-181): pkl metadata lists, per-scene intrinsics txt, depth/gray image
loading with the 476x630 top-left crop, 30k point cap, small-SE(3)
augmentation on the cloud with transform composition, gray mean removal.
Emits raw dicts for the 2D-3D collate (collate2d3d.build_2d3d_sample).
"""
from __future__ import annotations

import os
import pickle
import random
from typing import Optional

import numpy as np


def read_depth_image(path: str, depth_scale: float = 1000.0) -> np.ndarray:
    import cv2

    depth = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if depth is None:
        raise FileNotFoundError(path)
    return depth.astype(np.float32) / depth_scale


def read_image(path: str, as_gray: bool = False) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if as_gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def _random_small_transform(rng: np.random.RandomState, max_deg=5.0, max_trn=0.05):
    from scipy.spatial.transform import Rotation

    euler = (rng.rand(3) - 0.5) * 2 * np.deg2rad(max_deg)
    r = Rotation.from_euler("zyx", euler).as_matrix()
    t = (rng.rand(3) - 0.5) * 2 * max_trn
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


class RGBDScenes2D3DPairDataset:
    """subset pkl -> {image, image_gray, depth, intrinsics, transform,
    points, feats, overlap, ids}."""

    crop_hw = (476, 630)
    metadata_fmt = "{subset}.pkl"

    def __init__(self, dataset_dir: str, subset: str, *, max_points: Optional[int] = 30000,
                 scene_name: Optional[str] = None, overlap_threshold: Optional[float] = None,
                 use_augmentation: bool = False, augmentation_noise: float = 0.005,
                 seed: int = 0):
        self.dataset_dir = dataset_dir
        self.data_dir = os.path.join(dataset_dir, "data")
        meta = os.path.join(dataset_dir, "metadata",
                            self.metadata_fmt.format(subset=subset))
        with open(meta, "rb") as f:
            self.metadata = pickle.load(f)
        if scene_name is not None:
            self.metadata = [m for m in self.metadata if m["scene_name"] == scene_name]
        if overlap_threshold is not None:
            self.metadata = [m for m in self.metadata if m["overlap"] >= overlap_threshold]
        self.max_points = max_points
        self.use_augmentation = use_augmentation
        self.aug_noise = augmentation_noise
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.metadata)

    def scene_names(self):
        return sorted({m["scene_name"] for m in self.metadata})

    def __getitem__(self, index: int) -> dict:
        m = self.metadata[index]
        intrinsics = np.loadtxt(os.path.join(
            self.data_dir, m["scene_name"], "camera-intrinsics.txt")).astype(np.float32)
        transform = np.asarray(m["cloud_to_image"], np.float32)

        depth = read_depth_image(os.path.join(self.data_dir, m["depth_file"]))
        image = read_image(os.path.join(self.data_dir, m["image_file"]))
        gray = read_image(os.path.join(self.data_dir, m["image_file"]), as_gray=True)

        ch, cw = self.crop_hw
        depth, image, gray = depth[:ch, :cw], image[:ch, :cw], gray[:ch, :cw]

        points = np.load(os.path.join(self.data_dir, m["cloud_file"])).astype(np.float32)
        if self.max_points and len(points) > self.max_points:
            points = points[self.rng.permutation(len(points))[: self.max_points]]

        if self.use_augmentation:
            aug = _random_small_transform(self.rng)
            center = points.mean(axis=0)
            full = np.eye(4)
            full[:3, 3] = center
            full = full @ aug
            full[:3, 3] -= aug[:3, :3] @ center  # rotate about centroid
            points = points @ full[:3, :3].T + full[:3, 3]
            inv = np.eye(4)
            inv[:3, :3] = full[:3, :3].T
            inv[:3, 3] = -full[:3, :3].T @ full[:3, 3]
            transform = (transform @ inv).astype(np.float32)
            points = points + (self.rng.rand(*points.shape).astype(np.float32) - 0.5) * self.aug_noise

        gray = gray - gray.mean()

        return {
            "scene_name": m["scene_name"],
            "overlap": m.get("overlap", 1.0),
            "intrinsics": intrinsics,
            "transform": transform,
            "image": image.astype(np.float32),
            "image_gray": gray.astype(np.float32),
            "depth": depth.astype(np.float32),
            "points": points.astype(np.float32),
            "feats": np.ones((len(points), 1), np.float32),
        }


class SevenScenes2D3DPairDataset(RGBDScenes2D3DPairDataset):
    """7Scenes twin (sevenscenes_hard.py:29-142) — same data layout and the
    same 476x630 top-left crop; only the metadata list name differs
    (``{subset}-full.pkl``, sevenscenes_hard.py:55)."""

    metadata_fmt = "{subset}-full.pkl"
