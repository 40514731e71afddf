"""End-to-end CLI smoke on disk-backed data (VERDICT r1 item 10).

Builds tiny on-disk fixtures in the reference formats — a Predator-style
3DMatch info pkl + .pth cloud files, and 4DMatch .npz entries with
``s2t_flow`` / ``metric_index`` — writes a reference-schema YAML pointing
at them (plus a restorable checkpoint so the random-weight guard is
satisfied), and drives ``python -m diffreg_tpu.main`` in-process through
calibration, the parallel loader, the DDIM tester and the metric path.
The dataset readers (data/datasets.py) were the only untested layer.
"""
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax


def _make_cloud(rng, n):
    return (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.2


def _rigid(rng):
    from scipy.spatial.transform import Rotation

    rot = Rotation.from_euler("zyx", rng.rand(3) * 0.5).as_matrix().astype(np.float32)
    trn = (rng.rand(3, 1).astype(np.float32) - 0.5) * 0.2
    return rot, trn


def _tiny_model_yaml(extra: dict) -> dict:
    """Reference-schema config tree shrunk to test size."""
    base = {
        "kpfcn_config": {
            "first_feats_dim": 64,
            "first_subsampling_dl": 0.05,
            "in_feats_dim": 1,
            "conv_radius": 2.5,
            "num_kernel_points": 15,
            "KP_extent": 2.0,
            "coarse_feature_dim": 96,
            "fine_feature_dim": 32,
            "coarse_match_radius": 0.08,
            "coarse_level": -2,
        },
        "coarse_matching": {"feature_dim": 96, "confidence_threshold": 0.2,
                            "match_type": "sinkhorn", "skh_init_bin_score": 1.0,
                            "skh_iters": 3},
        "coarse_transformer": {
            "feature_dim": 96, "n_head": 4,
            "layer_types": ["self", "cross", "positioning", "self", "cross"],
            "positioning_type": "procrustes", "pe_type": "rotary",
            "vol_bnds": [[-3.6, -2.4, 1.14], [1.093, 0.78, 2.92]],
            "voxel_size": 0.08,
            "procrustes": {"max_condition_num": 40.0, "sample_rate": 1.0},
        },
        "batch_size": 2,
        "num_workers": 2,
        "calibration_pairs": 3,
        "SAMPLE_STEP": 2,
        "mode": "test",
        # the production default (65536, reference 50k-iter parity) is a CPU
        # compile/runtime hog at fixture scale
        "eval": {"ransac_hypotheses": 1024},
    }
    base.update(extra)
    return base


def _write_yaml(path, tree):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(tree, f)


def _save_checkpoint_for(cfg_yaml, probe_batch, ckpt_dir):
    """Init the model exactly like main.py will and save a restorable
    checkpoint so the random-weight guard passes."""
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.utils.config import build_pipeline_config

    cfg = build_pipeline_config(cfg_yaml)
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(int(cfg_yaml.get("seed", 0)))
    variables = model.init({"params": rng}, probe_batch, rng, mode="train")
    CheckpointManager(ckpt_dir).save(0, variables, {})
    return variables


class TestThreeDMatchCLI:
    def test_cli_end_to_end(self, tmp_path, rng):
        import torch

        data_root = tmp_path / "indoor"
        os.makedirs(data_root / "clouds")
        infos = {"rot": [], "trans": [], "src": [], "tgt": [], "gt_cov": []}
        for i in range(4):
            src = _make_cloud(rng, 700 + 60 * i)
            rot, trn = _rigid(rng)
            tgt = (src @ rot.T + trn.T).astype(np.float32)
            torch.save(torch.from_numpy(src), data_root / "clouds" / f"src{i}.pth")
            torch.save(torch.from_numpy(tgt), data_root / "clouds" / f"tgt{i}.pth")
            infos["rot"].append(rot)
            infos["trans"].append(trn)
            infos["src"].append(f"clouds/src{i}.pth")
            infos["tgt"].append(f"clouds/tgt{i}.pth")
            infos["gt_cov"].append(np.eye(6, dtype=np.float32))
        info_path = tmp_path / "test_info.pkl"
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)

        tree = _tiny_model_yaml({
            "dataset": "3dmatch",
            "data_root": str(data_root),
            "split": {"test": str(info_path)},
            "exp_dir": f"smoke3d-{os.getpid()}",
        })

        # probe batch like main.py builds it, to init + save the checkpoint
        from diffreg_tpu.data import PyramidConfig
        from diffreg_tpu.data.calibrate import calibrate_spec
        from diffreg_tpu.data.datasets import ThreeDMatchPairDataset, iterate_batches

        ds = ThreeDMatchPairDataset(str(info_path), str(data_root))
        assert len(ds) == 4
        pcfg = PyramidConfig(first_subsampling_dl=0.05, coarse_match_radius=0.08)
        spec = calibrate_spec([(ds[i]["src_pcd"], ds[i]["tgt_pcd"]) for i in range(3)],
                              pcfg)
        probe = next(iterate_batches(ds, spec, pcfg, 2))[0]
        ckpt_dir = str(tmp_path / "ckpt")
        _save_checkpoint_for(tree, probe, ckpt_dir)
        tree["pretrain"] = ckpt_dir

        cfg_path = tmp_path / "test3d.yaml"
        _write_yaml(cfg_path, tree)

        from diffreg_tpu.main import main

        main(["--config", str(cfg_path)])
        # reaches the tester and logs metrics without raising; random-ish
        # weights so metric VALUES are meaningless — the assertion is the
        # full CLI path on disk-backed data


class TestMeshCLI:
    """CLI auto-data-parallelism (VERDICT r2 item 3): with 8 virtual devices
    and a divisible batch size, main.py builds the mesh train/eval steps;
    demo train + test must run unchanged."""

    def test_demo_train_on_mesh(self, tmp_path):
        assert jax.device_count() == 8
        tree = _tiny_model_yaml({
            "mode": "train", "max_epoch": 1, "lr": 1e-4, "batch_size": 8,
            "SAMPLE_STEP": 1,
            "exp_dir": f"smokemesh-{os.getpid()}",
        })
        cfg_path = tmp_path / "mesh_train.yaml"
        _write_yaml(cfg_path, tree)

        from diffreg_tpu.main import main

        main(["--config", str(cfg_path), "--demo", "--num-pairs", "8"])
        import glob as _glob

        assert _glob.glob(f"snapshot/smokemesh-{os.getpid()}/checkpoints/*")

    def test_demo_test_on_mesh(self, tmp_path):
        tree = _tiny_model_yaml({
            "batch_size": 8, "SAMPLE_STEP": 1,
            "exp_dir": f"smokemesht-{os.getpid()}",
        })
        cfg_path = tmp_path / "mesh_test.yaml"
        _write_yaml(cfg_path, tree)

        from diffreg_tpu.main import main

        main(["--config", str(cfg_path), "--demo", "--num-pairs", "8"])


class TestTrainValCLI:
    def test_train_with_val_loop(self, tmp_path, rng):
        """One training epoch + the validation loop through the CLI
        (VERDICT r1 partial #38: val loop was unwired)."""
        import torch

        data_root = tmp_path / "indoor"
        os.makedirs(data_root / "clouds")
        infos = {"rot": [], "trans": [], "src": [], "tgt": []}
        for i in range(4):
            src = _make_cloud(rng, 500)
            rot, trn = _rigid(rng)
            tgt = (src @ rot.T + trn.T).astype(np.float32)
            torch.save(torch.from_numpy(src), data_root / "clouds" / f"s{i}.pth")
            torch.save(torch.from_numpy(tgt), data_root / "clouds" / f"t{i}.pth")
            infos["rot"].append(rot)
            infos["trans"].append(trn)
            infos["src"].append(f"clouds/s{i}.pth")
            infos["tgt"].append(f"clouds/t{i}.pth")
        train_pkl = tmp_path / "train_info.pkl"
        val_pkl = tmp_path / "val_info.pkl"
        with open(train_pkl, "wb") as f:
            pickle.dump(infos, f)
        with open(val_pkl, "wb") as f:
            pickle.dump({k: v[:2] for k, v in infos.items()}, f)

        tree = _tiny_model_yaml({
            "dataset": "3dmatch",
            "mode": "train",
            "max_epoch": 1,
            "lr": 1e-4,
            "data_root": str(data_root),
            "split": {"train": str(train_pkl), "val": str(val_pkl)},
            "exp_dir": f"smoketrain-{os.getpid()}",
        })
        tree["SAMPLE_STEP"] = 1
        cfg_path = tmp_path / "train3d.yaml"
        _write_yaml(cfg_path, tree)

        from diffreg_tpu.main import main

        main(["--config", str(cfg_path)])
        # one epoch trained, val metrics computed, checkpoint saved
        import glob as _glob

        assert _glob.glob(f"snapshot/smoketrain-{os.getpid()}/checkpoints/*")


class TestFourDMatchCLI:
    def test_cli_end_to_end(self, tmp_path, rng):
        split_dir = tmp_path / "4dsplit"
        os.makedirs(split_dir)
        for i in range(4):
            src = _make_cloud(rng, 600 + 50 * i)
            rot, trn = _rigid(rng)
            flow = (rng.rand(*src.shape).astype(np.float32) - 0.5) * 0.02
            tgt = ((src + flow) @ rot.T + trn.T).astype(np.float32)
            np.savez(split_dir / f"pair{i}.npz",
                     src_pcd=src, tgt_pcd=tgt, s2t_flow=flow, rot=rot, trans=trn,
                     metric_index=np.arange(0, len(src), 3))

        tree = _tiny_model_yaml({
            "dataset": "4dmatch",
            "data_root": str(tmp_path),
            "split": {"test": str(split_dir)},
            "exp_dir": f"smoke4d-{os.getpid()}",
        })

        from diffreg_tpu.data import PyramidConfig
        from diffreg_tpu.data.calibrate import calibrate_spec
        from diffreg_tpu.data.datasets import FourDMatchPairDataset, iterate_batches

        ds = FourDMatchPairDataset(str(split_dir))
        assert len(ds) == 4
        assert ds[0]["scene_flow"] is not None
        assert ds[0]["metric_index"] is not None
        pcfg = PyramidConfig(first_subsampling_dl=0.05, coarse_match_radius=0.08)
        spec = calibrate_spec([(ds[i]["src_pcd"], ds[i]["tgt_pcd"]) for i in range(3)],
                              pcfg)
        probe = next(iterate_batches(ds, spec, pcfg, 2))[0]
        ckpt_dir = str(tmp_path / "ckpt4d")
        _save_checkpoint_for(tree, probe, ckpt_dir)
        tree["pretrain"] = ckpt_dir

        cfg_path = tmp_path / "test4d.yaml"
        _write_yaml(cfg_path, tree)

        from diffreg_tpu.main import main

        main(["--config", str(cfg_path), "--thr", "0.55"])
