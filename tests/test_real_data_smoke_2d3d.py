"""End-to-end 2D-3D CLI smoke on disk-backed data (VERDICT r2 item 6).

Builds a tiny on-disk fixture in the reference RGB-D Scenes V2 / 7Scenes
layout — ``metadata/{test,test-full}.pkl`` lists, per-scene
``camera-intrinsics.txt``, 16-bit millimeter depth pngs, color pngs and
``.npy`` clouds (vision3d rgbdscenes.py:22-181, sevenscenes_hard.py:29-142)
— and drives ``python -m diffreg_tpu.main`` in-process through shape
calibration, the collate, the tester, the npz prediction cache and
``eval_from_cache``. Covers the previously hardcoded ``Spec2D3D``
(calibrate_spec_2d3d) and the 7Scenes dataset selection.
"""
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

H, W = 128, 168      # < the 476x630 reference crop: top-left slice is a no-op


def _scene_cloud_and_frames(rng, scene_dir, n_frames=2):
    """Write one scene: intrinsics, per-frame depth/color, per-frame cloud."""
    import cv2
    from scipy.spatial.transform import Rotation

    fx = fy = 140.0
    cx, cy = W / 2.0, H / 2.0
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    os.makedirs(scene_dir, exist_ok=True)
    np.savetxt(os.path.join(scene_dir, "camera-intrinsics.txt"), intr)

    metas = []
    for fi in range(n_frames):
        # smooth positive depth in mm (1.2m..2.6m)
        vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        depth_m = 1.2 + 0.7 * (1 + np.sin(uu / 37.0 + fi) * np.cos(vv / 23.0))
        depth_mm = (depth_m * 1000).astype(np.uint16)
        depth_name = f"depth_{fi:03d}.png"
        color_name = f"color_{fi:03d}.png"
        cv2.imwrite(os.path.join(scene_dir, depth_name), depth_mm)
        cv2.imwrite(os.path.join(scene_dir, color_name),
                    (rng.rand(H, W, 3) * 255).astype(np.uint8))

        # cloud = back-projected depth subset, moved out of the camera frame
        # by a known rigid transform; cloud_to_image maps it back
        z = depth_m
        x = (uu - cx) * z / fx
        y = (vv - cy) * z / fy
        cam = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
        cam = cam[rng.permutation(len(cam))[:4000]]
        rot = Rotation.from_euler("zyx", rng.rand(3) * 0.6).as_matrix().astype(np.float32)
        trn = (rng.rand(3).astype(np.float32) - 0.5) * 0.4
        cloud = (cam - trn) @ rot           # cam = cloud @ rot.T + trn
        cloud_to_image = np.eye(4, dtype=np.float32)
        cloud_to_image[:3, :3] = rot
        cloud_to_image[:3, 3] = trn
        cloud_name = f"cloud_{fi:03d}.npy"
        np.save(os.path.join(scene_dir, cloud_name), cloud.astype(np.float32))
        metas.append({
            "image_file": color_name, "depth_file": depth_name,
            "cloud_file": cloud_name, "cloud_to_image": cloud_to_image,
            "overlap": 0.9,
        })
    return metas


def _build_dataset_dir(tmp_path, rng, metadata_name):
    root = tmp_path / "rgbd"
    scene = "scene_01"
    metas = _scene_cloud_and_frames(rng, str(root / "data" / scene))
    for m in metas:
        m["scene_name"] = scene
        for k in ("image_file", "depth_file", "cloud_file"):
            m[k] = f"{scene}/{m[k]}"
    os.makedirs(root / "metadata", exist_ok=True)
    with open(root / "metadata" / metadata_name, "wb") as f:
        pickle.dump(metas, f)
    return str(root)


def _tiny_yaml(data_root, dataset, exp_dir, pretrain):
    return {
        "dataset": dataset,
        "mode": "test",
        "data_root": data_root,
        "batch_size": 2,
        "calibration_pairs": 2,
        "SAMPLE_STEP": 1,
        "seed": 0,
        "exp_dir": exp_dir,
        "pretrain": pretrain,
        "model_2d3d": {
            "img_out_dim": 32, "img_base_dim": 16,
            "pcd_output_dim": 32, "pcd_init_dim": 16,
            "hidden_dim": 32, "output_dim": 32, "num_heads": 2,
            "coarse_stride": 8,
            "pcd_num_points_in_patch": 16, "pcd_min_node_size": 3,
        },
        "eval": {"write_cache": True},
    }


def _save_ckpt(tree, data_root, ds_cls, ckpt_dir):
    import jax

    from diffreg_tpu.data.calibrate import calibrate_spec_2d3d
    from diffreg_tpu.data.collate2d3d import batch_2d3d, build_2d3d_sample
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig

    m = tree["model_2d3d"]
    cfg = Pipeline2D3DConfig(
        img_out_dim=m["img_out_dim"], img_base_dim=m["img_base_dim"],
        pcd_backbone=PointBackboneConfig(
            output_dim=m["pcd_output_dim"], init_dim=m["pcd_init_dim"]),
        hidden_dim=m["hidden_dim"], output_dim=m["output_dim"],
        num_heads=m["num_heads"],
        matching=MatchingConfig(feature_dim=m["output_dim"]),
        coarse_stride=m["coarse_stride"],
        pcd_num_points_in_patch=m["pcd_num_points_in_patch"],
        pcd_min_node_size=m["pcd_min_node_size"],
        sample_steps=tree["SAMPLE_STEP"])
    model = DiffReg2D3D(cfg)

    ds = ds_cls(data_root, "test")
    spec = calibrate_spec_2d3d([ds[i]["points"] for i in range(len(ds))])
    st = cfg.coarse_stride
    raw_s = ds[0]
    h = raw_s["depth"].shape[0] // st * st
    w = raw_s["depth"].shape[1] // st * st
    for k in ("depth", "image", "image_gray"):
        raw_s[k] = raw_s[k][:h, :w]
    probe = batch_2d3d([build_2d3d_sample(raw_s, spec, st)] * 2)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, probe, rng, mode="train")
    CheckpointManager(ckpt_dir).save(0, variables, {})


def _run_and_check(tmp_path, rng, dataset, metadata_name, ds_cls):
    import glob

    data_root = _build_dataset_dir(tmp_path, rng, metadata_name)
    ckpt_dir = str(tmp_path / "ckpt")
    exp_dir = f"smoke2d3d-{dataset}-{os.getpid()}"
    tree = _tiny_yaml(data_root, dataset, exp_dir, ckpt_dir)
    _save_ckpt(tree, data_root, ds_cls, ckpt_dir)

    import yaml

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(tree, f)

    from diffreg_tpu.main import main

    main(["--config", str(cfg_path)])

    cache = glob.glob(f"snapshot/{exp_dir}/cache/*/*.npz")
    assert cache, "tester wrote no npz prediction cache"
    d = np.load(cache[0])
    for key in ("pcd_corr_points", "img_corr_points", "corr_scores",
                "transform", "intrinsics", "gt_pcd_node_corr_indices"):
        assert key in d, f"cache missing {key}"


class TestRGBDScenesCLI:
    def test_cli_end_to_end(self, tmp_path, rng):
        _run_and_check_rgbd(tmp_path, rng)


def _run_and_check_rgbd(tmp_path, rng):
    from diffreg_tpu.data.datasets2d3d import RGBDScenes2D3DPairDataset

    _run_and_check(tmp_path, rng, "rgbdv2", "test.pkl", RGBDScenes2D3DPairDataset)


class TestSevenScenesCLI:
    def test_cli_end_to_end(self, tmp_path, rng):
        from diffreg_tpu.data.datasets2d3d import SevenScenes2D3DPairDataset

        _run_and_check(tmp_path, rng, "7scenes", "test-full.pkl",
                       SevenScenes2D3DPairDataset)
