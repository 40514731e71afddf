"""vision3d library dataset readers on tiny disk fixtures.

Each test writes a miniature dataset in the reference's on-disk layout and
checks the reader emits the raw-sample schema with a consistent GT (the
transform really maps src onto tgt / the flow really deforms src onto tgt).
"""
import os
import pickle

import numpy as np
import pytest

from diffreg_tpu.data.library_datasets import (
    CapePairDataset,
    DeepDeformPairDataset,
    ModelNetPairDataset,
    OdometryKittiPairDataset,
    RedwoodPairDataset,
    ScanNetURRPairDataset,
    ShapeNetPairDataset,
    apply_transform,
    point_cloud_overlap,
    random_sample_transform,
)


def _check_schema(d):
    for k in ("src_points", "tgt_points", "src_feats", "tgt_feats", "transform"):
        assert k in d, k
    assert d["src_points"].dtype == np.float32
    assert d["transform"].shape == (4, 4)


def _gt_residual(d):
    from scipy.spatial import cKDTree

    src_t = apply_transform(d["src_points"], d["transform"])
    dist, _ = cKDTree(d["tgt_points"]).query(src_t, k=1)
    return np.median(dist)


class TestOdometryKitti:
    def _write(self, root, rng):
        os.makedirs(root / "metadata", exist_ok=True)
        os.makedirs(root / "seq", exist_ok=True)
        metas = []
        for i in range(2):
            tgt = rng.rand(500, 3).astype(np.float32) * 10
            tfm = random_sample_transform(rng, 30.0, 1.0)
            src = apply_transform(tgt, np.linalg.inv(tfm)).astype(np.float32)
            np.save(root / "seq" / f"{i}_0.npy", tgt)
            np.save(root / "seq" / f"{i}_1.npy", src)
            metas.append({"seq_id": "08", "frame0": 2 * i, "frame1": 2 * i + 1,
                          "pcd0": f"seq/{i}_0.npy", "pcd1": f"seq/{i}_1.npy",
                          "transform": tfm})
        with open(root / "metadata" / "test.pkl", "wb") as f:
            pickle.dump(metas, f)

    def test_reader_and_augmentation(self, tmp_path, rng):
        self._write(tmp_path, rng)
        ds = OdometryKittiPairDataset(str(tmp_path), "test", max_points=400,
                                      rng=np.random.RandomState(0))
        assert len(ds) == 2
        d = ds[0]
        _check_schema(d)
        assert len(d["src_points"]) <= 400
        assert _gt_residual(d) < 1e-3

        aug = OdometryKittiPairDataset(str(tmp_path), "test",
                                       use_augmentation=True,
                                       return_corr_indices=True,
                                       matching_radius=0.3,
                                       rng=np.random.RandomState(1))
        da = aug[0]
        # the recomposed pose must still register the augmented clouds
        # (noise 0.005 + resampling keeps the residual small)
        assert _gt_residual(da) < 0.05
        assert len(da["src_corr_indices"]) > 0


class TestModelNet:
    def _write(self, root, rng):
        data = []
        for label in (0, 2, 5):   # 5 (bottle) is symmetric
            pts = rng.randn(1500, 3).astype(np.float32)
            nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
            data.append({"points": pts, "normals": nrm, "label": label})
        with open(root / "test.pkl", "wb") as f:
            pickle.dump(data, f)

    def test_pair_generation(self, tmp_path, rng):
        self._write(tmp_path, rng)
        ds = ModelNetPairDataset(str(tmp_path), "test", num_points=512,
                                 keep_ratio=0.7, deterministic=True,
                                 return_corr_indices=True,
                                 matching_radius=0.08,
                                 rng=np.random.RandomState(0))
        assert len(ds) == 2      # label 5 (bottle) is symmetric -> filtered
        d = ds[0]
        _check_schema(d)
        assert "src_normals" in d
        # crop keeps ~70%
        assert abs(len(d["src_points"]) - int(512 * 0.7 + 0.5)) <= 1
        ov = point_cloud_overlap(d["src_points"], d["tgt_points"],
                                 d["transform"], 0.08)
        assert ov > 0.0
        assert len(d["src_corr_indices"]) > 0

    def test_class_filtering(self, tmp_path, rng):
        self._write(tmp_path, rng)
        ds = ModelNetPairDataset(str(tmp_path), "test", class_indices=[0],
                                 rng=np.random.RandomState(0))
        assert len(ds) == 1
        # symmetric classes dropped when asymmetric=True: 5(bottle) is
        # not in ASYMMETRIC_INDICES
        ds2 = ModelNetPairDataset(str(tmp_path), "test", class_indices="all",
                                  asymmetric=True,
                                  rng=np.random.RandomState(0))
        assert len(ds2) == 2


class TestShapeNet:
    def test_axis_swap_and_pairs(self, tmp_path, rng):
        os.makedirs(tmp_path / "metadata", exist_ok=True)
        os.makedirs(tmp_path / "data" / "chair", exist_ok=True)
        pts = rng.randn(1200, 3).astype(np.float32)
        nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        np.savez(tmp_path / "data" / "chair" / "m0.npz", points=pts, normals=nrm)
        with open(tmp_path / "metadata" / "test.txt", "w") as f:
            f.write("chair/m0.npz\n")
        ds = ShapeNetPairDataset(str(tmp_path), "test", num_points=256,
                                 deterministic=True,
                                 rng=np.random.RandomState(0))
        d = ds[0]
        _check_schema(d)
        assert d["label"] == "chair"


class TestDeformableNpz:
    def _write(self, root, rng, cls_dir="pairs"):
        os.makedirs(root / "metadata", exist_ok=True)
        os.makedirs(root / cls_dir, exist_ok=True)
        src = rng.rand(300, 3).astype(np.float32)
        flow = rng.randn(300, 3).astype(np.float32) * 0.05
        np.savez(root / cls_dir / "p0.npz", src_points=src,
                 tgt_points=src + flow, scene_flows=flow)
        with open(root / "metadata" / "train.pkl", "wb") as f:
            pickle.dump([f"{cls_dir}/p0.npz"], f)

    @pytest.mark.parametrize("cls", [CapePairDataset, DeepDeformPairDataset])
    def test_flow_schema(self, tmp_path, rng, cls):
        self._write(tmp_path, rng)
        ds = cls(str(tmp_path), "train")
        d = ds[0]
        _check_schema(d)
        np.testing.assert_allclose(
            d["src_points"] + d["scene_flows"], d["tgt_points"], atol=1e-6)
        assert d["max_flow"] >= d["mean_flow"] > 0


class TestRedwood:
    def test_fragment_pairs(self, tmp_path, rng):
        from diffreg_tpu.utils.ply import write_ply

        frag = tmp_path / "fragments"
        os.makedirs(frag, exist_ok=True)
        base = rng.rand(400, 3).astype(np.float32)
        poses = []
        for i in range(3):
            tfm = random_sample_transform(rng, 20.0, 0.5)
            poses.append(tfm)
            # fragment stored in its own frame: world = pose @ local
            local = apply_transform(base, np.linalg.inv(tfm)).astype(np.float32)
            write_ply(str(frag / f"f{i:02d}.ply"),
                      [local[:, 0], local[:, 1], local[:, 2]],
                      ["x", "y", "z"])
            np.save(frag / f"f{i:02d}.npy", tfm)
        ds = RedwoodPairDataset(str(tmp_path), frame_gap=1)
        assert len(ds) == 2
        d = ds[0]
        _check_schema(d)
        assert _gt_residual(d) < 1e-3


class TestScanNetURR:
    def test_depth_pairs(self, tmp_path, rng):
        import cv2
        from scipy.spatial.transform import Rotation

        scene = tmp_path / "data" / "scene0"
        for sub in ("depth", "pose"):
            os.makedirs(scene / sub, exist_ok=True)
        intr = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        np.savetxt(scene / "intrinsics.txt", intr)
        for fi in range(2):
            depth = (1.2 + 0.4 * rng.rand(96, 128)) * 1000
            cv2.imwrite(str(scene / "depth" / f"{fi}.png"),
                        depth.astype(np.uint16))
            pose = np.eye(4)
            pose[:3, :3] = Rotation.from_euler("z", 0.1 * fi).as_matrix()
            pose[:3, 3] = [0.1 * fi, 0, 0]
            np.savetxt(scene / "pose" / f"{fi}.txt", pose)
        os.makedirs(tmp_path / "metadata", exist_ok=True)
        with open(tmp_path / "metadata" / "test.pkl", "wb") as f:
            pickle.dump([{"scene_name": "scene0", "src_frame": 0,
                          "tgt_frame": 1}], f)
        ds = ScanNetURRPairDataset(str(tmp_path), "test", max_points=2000)
        d = ds[0]
        _check_schema(d)
        assert "intrinsics" in d
        # transform maps src camera frame into tgt camera frame
        assert np.isfinite(d["transform"]).all()
