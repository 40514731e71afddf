"""RGBDScenes reader + 2D-3D collate tests (synthetic on-disk fixture)."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from diffreg_tpu.data.collate2d3d import Spec2D3D, batch_2d3d, build_2d3d_sample
from diffreg_tpu.data.datasets2d3d import RGBDScenes2D3DPairDataset


@pytest.fixture
def fake_rgbd_root(tmp_path, rng):
    scene = "scene_01"
    data = tmp_path / "data" / scene
    meta = tmp_path / "metadata"
    os.makedirs(data)
    os.makedirs(meta)

    h, w = 480, 640
    # locally smooth depth (like real sensors): low-res noise upsampled.
    # Uniform per-pixel random depth makes every patch's enclosing sphere
    # ~1 m wide and the GT overlap candidate set quadratic.
    base = (rng.rand(h // 40, w // 40) * 2 + 0.5).astype(np.float32)
    depth_m = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
    cv2.imwrite(str(data / "depth_000.png"), (depth_m * 1000).astype(np.uint16))
    cv2.imwrite(str(data / "image_000.png"), (rng.rand(h, w, 3) * 255).astype(np.uint8))
    K = np.array([[525.0, 0, 320], [0, 525, 240], [0, 0, 1]])
    np.savetxt(data / "camera-intrinsics.txt", K)
    # cloud geometrically consistent with the depth map (identity transform):
    # back-project a random subset of pixels
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth_m.reshape(-1)
    x = (uu.reshape(-1) - 320) * z / 525.0
    y = (vv.reshape(-1) - 240) * z / 525.0
    cam_pts = np.stack([x, y, z], -1).astype(np.float32)
    sel = rng.permutation(len(cam_pts))[:2000]
    np.save(data / "cloud_000.npy", cam_pts[sel])

    metadata = [{
        "scene_name": scene,
        "image_file": f"{scene}/image_000.png",
        "depth_file": f"{scene}/depth_000.png",
        "cloud_file": f"{scene}/cloud_000.npy",
        "cloud_to_image": np.eye(4, dtype=np.float32),
        "overlap": 0.8,
    }]
    with open(meta / "test.pkl", "wb") as f:
        pickle.dump(metadata, f)
    return str(tmp_path)


class TestRGBDScenesReader:
    def test_load_and_crop(self, fake_rgbd_root):
        ds = RGBDScenes2D3DPairDataset(fake_rgbd_root, "test")
        assert len(ds) == 1
        s = ds[0]
        assert s["depth"].shape == (476, 630)
        assert s["image_gray"].shape == (476, 630)
        assert abs(float(s["image_gray"].mean())) < 1e-5  # mean-removed
        assert s["points"].shape[1] == 3
        assert s["intrinsics"][0, 0] == 525.0

    def test_augmentation_preserves_geometry(self, fake_rgbd_root):
        ds_plain = RGBDScenes2D3DPairDataset(fake_rgbd_root, "test")
        ds_aug = RGBDScenes2D3DPairDataset(fake_rgbd_root, "test",
                                           use_augmentation=True, seed=3)
        plain = ds_plain[0]
        aug = ds_aug[0]
        # camera-space positions invariant: T' @ p' == T @ p (up to noise)
        cam_plain = plain["points"] @ plain["transform"][:3, :3].T + plain["transform"][:3, 3]
        cam_aug = aug["points"] @ aug["transform"][:3, :3].T + aug["transform"][:3, 3]
        # same underlying points (max_points permutation uses separate rngs;
        # compare sorted sets loosely via means)
        np.testing.assert_allclose(cam_plain.mean(0), cam_aug.mean(0), atol=0.02)

    def test_collate_builds_batch(self, fake_rgbd_root):
        ds = RGBDScenes2D3DPairDataset(fake_rgbd_root, "test")
        raw = ds[0]
        # crop to stride-divisible window like the pipeline requires
        raw["depth"] = raw["depth"][:472, :624]
        raw["image_gray"] = raw["image_gray"][:472, :624]
        raw["image"] = raw["image"][:472, :624]
        spec = Spec2D3D(n_points=(2048, 2048, 2048), init_radius=0.15)
        sample = build_2d3d_sample(raw, spec)
        batch = batch_2d3d([sample], as_jnp=False)
        assert batch.image.shape == (1, 472, 624, 1)
        assert batch.points[0].shape == (1, 2048, 3)
        assert batch.gt_valid.sum() > 0
