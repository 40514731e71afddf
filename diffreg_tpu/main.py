"""CLI: train / test with reference-compatible configs.

    python -m diffreg_tpu.main --config configs/test/3dmatch.yaml
    python -m diffreg_tpu.main --config configs/test/4dmatch.yaml --thr 0.55
    python -m diffreg_tpu.main --config configs/test/3dmatch.yaml --demo

Mirrors the reference entry point (Diff-Reg-3dmatch/main.py): YAML with
``!join`` tags -> typed config -> model/optimizer/loaders -> engine. The
``--demo`` flag (or absent data_root) runs the full pipeline on synthetic
pairs so the stack can be exercised without the benchmark datasets.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser("diffreg_tpu")
    p.add_argument("--config", required=True)
    p.add_argument("--thr", type=float, default=None,
                   help="match threshold for 4DMatch extraction (README.md:25)")
    p.add_argument("--mode", default=None, choices=[None, "train", "test"])
    p.add_argument("--demo", action="store_true",
                   help="run on synthetic pairs (no dataset needed)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-pairs", type=int, default=16, help="demo pairs")
    p.add_argument("--resume", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from .data import PyramidConfig, synthetic_batch
    from .engine import LossConfig, OptimConfig, create_train_state, make_train_step
    from .engine.tester import FourDMatchTester, TestConfig, ThreeDMatchTester
    from .engine.trainer import Trainer, TrainerConfig
    from .models import DiffusionMatchingModel
    from .utils.config import (
        build_loss_config,
        build_optim_config,
        build_pipeline_config,
        load_yaml,
    )
    from .utils.logging import Logger

    raw = load_yaml(args.config)
    # matmul precision policy: 'highest' (parity default) or 'default'
    # (bf16-input matmuls; pose-critical contractions stay pinned HIGHEST)
    if raw.get("precision"):
        from .utils.precision import set_precision

        set_precision(str(raw["precision"]))
    # parity runs force exact torch-equivalent top-k (ops/topk.py); default
    # stays the TPU approx_max_k fast path
    if raw.get("exact_topk") is not None:
        from .ops.topk import set_exact_topk

        set_exact_topk(bool(raw["exact_topk"]))
    # parity_eval: protocol-exact metric-audit mode — host pose estimators
    # (open3d RANSAC / cv2 PnP, the reference's, VERDICT r2 item 7), exact
    # top-k and HIGHEST-precision matmuls in one switch
    if raw.get("parity_eval"):
        from .ops.topk import set_exact_topk
        from .utils.precision import set_precision

        set_exact_topk(True)
        set_precision("highest")
        raw.setdefault("eval", {})
        raw["eval"].setdefault("pose_backend", "open3d")
        raw["eval"].setdefault("pnp_backend", "opencv")
    mode = args.mode or raw.get("mode", "test")
    batch_size = args.batch_size or int(raw.get("batch_size", 1))
    dataset_name = str(raw.get("dataset", "3dmatch"))

    if dataset_name in ("rgbdv2", "7scenes"):
        return run_2d3d(args, raw, mode, batch_size, dataset_name)

    pipeline_cfg = build_pipeline_config(raw)
    loss_cfg = build_loss_config(raw)

    # multi-host: initialize the JAX distributed runtime when the env
    # requests it (torchrun/DDP twin — Diff-Reg-3dmatch/main.py:44-47);
    # dist info feeds the per-host data shard + lr scaling below
    from .parallel.distributed import setup_distributed

    dist = setup_distributed()

    save_dir = os.path.join("snapshot", raw.get("exp_dir", "run"))
    logger = Logger(save_dir)
    logger.info(f"devices: {jax.devices()}")
    if dist["process_count"] > 1:
        logger.info(f"multi-host: process {dist['process_index']}/"
                    f"{dist['process_count']}, "
                    f"{dist['local_devices']} local devices")
    logger.info(f"task={dataset_name} mode={mode} steps={pipeline_cfg.sample_steps}")

    model = DiffusionMatchingModel(pipeline_cfg)

    data_root = raw.get("data_root", "")
    have_data = bool(data_root) and os.path.exists(data_root)
    demo = args.demo or not have_data
    loader_stats = {}
    if demo:
        logger.info("demo mode: synthetic pairs (dataset not found)")

        def make_iter(epoch=0, n=args.num_pairs):
            def it():
                for i in range(max(1, n // batch_size)):
                    batch, _, _ = synthetic_batch(
                        batch_size=batch_size, n_points=768,
                        seed=1000 * epoch + i,
                        deformable=(dataset_name == "4dmatch"))
                    yield batch, [{}] * batch_size
            return it()

        make_test_iter = lambda: make_iter(0)
    else:
        from .data.batch import ShapeSpec
        from .data.calibrate import calibrate_spec
        from .data.datasets import (
            FourDMatchPairDataset,
            ThreeDMatchPairDataset,
            iterate_batches,
        )

        split = raw["split"]["test" if mode == "test" else "train"]
        if dataset_name == "4dmatch":
            ds = FourDMatchPairDataset(split, augment=(mode == "train"))
        else:
            ds = ThreeDMatchPairDataset(split, data_root, augment=(mode == "train"),
                                        augment_noise=float(raw.get("augment_noise", 0.005)))
        pyr_cfg = PyramidConfig(
            first_subsampling_dl=pipeline_cfg.kpfcn.first_subsampling_dl,
            conv_radius=pipeline_cfg.kpfcn.conv_radius,
            coarse_match_radius=float(raw.get("kpfcn_config", {}).get("coarse_match_radius", 0.06)),
        )
        # calibrate from pairs SPREAD across the dataset (not the first few,
        # which tend to share a scene) — the reference histograms >=2000
        # neighborhood samples (datasets/dataloader.py:562-589); each pair
        # contributes up to 2000 queries per level, and the size maxima need
        # scene diversity
        n_calib = min(int(raw.get("calibration_pairs", 24)), len(ds))
        calib_idx = np.linspace(0, len(ds) - 1, n_calib).astype(int)
        sample_pairs = [(ds[int(i)]["src_pcd"], ds[int(i)]["tgt_pcd"])
                        for i in calib_idx]
        # reference histograms at the 90th percentile; lowering (e.g. 80)
        # trims gather rows ~20% — gate with tools/percentile_k_experiment.py
        spec = calibrate_spec(
            sample_pairs, pyr_cfg,
            neighbor_percentile=float(raw.get("neighbor_percentile", 90.0)))
        logger.info(f"calibrated spec from {n_calib} pairs: {spec}")

        num_workers = int(raw.get("num_workers", 8))

        def make_iter(epoch=0):
            # per-host shard of the (identically shuffled) epoch order —
            # the DistributedSampler twin (reference main.py:127)
            return iterate_batches(ds, spec, pyr_cfg, batch_size,
                                   shuffle=(mode == "train"), seed=epoch,
                                   num_workers=num_workers, stats=loader_stats,
                                   process_index=dist["process_index"],
                                   process_count=dist["process_count"])

        make_test_iter = lambda: make_iter(0)

    # ExpLR decays per EPOCH in the reference (scheduler.step, trainer.py);
    # our step-count schedule needs the true epoch length for gamma^epoch
    # parity (VERDICT r2 weak #8)
    steps_per_epoch = max(1, (args.num_pairs if demo else len(ds)) // batch_size)
    optim_cfg = build_optim_config(raw, steps_per_epoch=steps_per_epoch,
                                   world_size=dist["process_count"])

    rng = jax.random.PRNGKey(int(raw.get("seed", 0)))
    if demo:
        probe_batch, _, _ = synthetic_batch(
            batch_size=batch_size, n_points=768, seed=0,
            deformable=(dataset_name == "4dmatch"))
    else:
        probe_batch = next(make_test_iter())[0]

    # data-parallel mesh whenever >1 device is visible — the reference wires
    # DDP in its entry point (Diff-Reg-3dmatch/main.py:44-47,125-129); here
    # one SPMD jit over a 'data' mesh replaces it (parallel/mesh.py)
    mesh = None
    if jax.device_count() > 1 and batch_size % jax.device_count() == 0:
        from .parallel.mesh import make_mesh

        mesh = make_mesh()
        logger.info(f"data-parallel mesh over {jax.device_count()} devices")
    elif jax.device_count() > 1:
        logger.warning(
            f"{jax.device_count()} devices but batch_size={batch_size} not "
            "divisible — running single-device; pick a divisible batch size")

    if mode == "train":
        from .engine import make_eval_step

        # archive the training run's source + configs next to its
        # checkpoints (reference main.py:66-74), master process only
        if dist["process_index"] == 0:
            from .utils.snapshot import backup_sources

            backup_sources(save_dir, args.config)

        state = create_train_state(model, probe_batch, rng, optim_cfg)
        if mesh is not None:
            from .parallel.mesh import make_parallel_train_step, replicate

            state = replicate(state, mesh)
            step = make_parallel_train_step(model, loss_cfg, optim_cfg, mesh)
        else:
            step = jax.jit(make_train_step(model, loss_cfg, optim_cfg))

        # validation loop when the split declares one (reference BaseTrainer
        # val_epoch, vision3d/engine/base_trainer.py:342-414)
        make_val_iter = val_step = None
        val_split = raw.get("split", {}).get("val") if not demo else None
        if val_split and os.path.exists(val_split):
            from .data.datasets import (
                FourDMatchPairDataset as _FD,
                ThreeDMatchPairDataset as _TD,
                iterate_batches as _ib,
            )

            if dataset_name == "4dmatch":
                val_ds = _FD(val_split, augment=False)
            else:
                val_ds = _TD(val_split, data_root, augment=False)
            make_val_iter = lambda epoch: _ib(val_ds, spec, pyr_cfg, batch_size,
                                             num_workers=num_workers)
            val_step = jax.jit(make_eval_step(model, loss_cfg))

        trainer = Trainer(step, state, make_iter,
                          TrainerConfig(max_epoch=int(raw.get("max_epoch", 10)),
                                        save_dir=save_dir),
                          make_val_iter=make_val_iter, val_step=val_step,
                          logger=logger, rng=rng)
        if args.resume:
            trainer.resume()
        trainer.train()
    else:
        variables = model.init({"params": rng}, probe_batch, rng, mode="train")
        pretrain = raw.get("pretrain", "")
        if pretrain and os.path.exists(pretrain):
            from .engine.checkpoint import CheckpointManager

            mgr = CheckpointManager(pretrain)
            restored = mgr.restore(variables)
            if restored is not None:
                variables = restored
                logger.info(f"restored weights from {pretrain}")
            else:
                logger.warning(
                    f"pretrain={pretrain!r} yielded no restorable checkpoint — "
                    "metric run uses RANDOM weights; numbers are meaningless")
        elif not demo:
            raise SystemExit(
                f"refusing a metric run on real data with random weights: "
                f"pretrain={pretrain!r} not found. Pass a valid 'pretrain' in "
                "the config, or use --demo for a synthetic smoke run.")
        pose_backend = str(raw.get("eval", {}).get("pose_backend", "device"))
        # device-RANSAC budget: default 65536 == reference 50k-iter parity at
        # the hard-pair tail (budget study, ROADMAP); YAML eval.ransac_hypotheses
        # overrides (fixture smokes use a small budget on CPU)
        ransac_h = int(raw.get("eval", {}).get("ransac_hypotheses", 65536))
        if pose_backend == "open3d":
            from .eval.host_estimators import has_open3d

            if not has_open3d():
                logger.warning("eval.pose_backend=open3d but open3d is not "
                               "installed — falling back to the device RANSAC")
                pose_backend = "device"
        if dataset_name == "4dmatch":
            from .engine.tester import make_metric_points_fn

            tcfg = TestConfig(inlier_thr=0.04,
                              match_thr=args.thr if args.thr is not None else 0.55,
                              pose_backend=pose_backend,
                              ransac_hypotheses=ransac_h)
            tester = FourDMatchTester(model, variables, tcfg, logger, mesh=mesh)
            tester.test(make_test_iter, rng=rng,
                        metric_points_fn=make_metric_points_fn())
        else:
            tester = ThreeDMatchTester(
                model, variables,
                TestConfig(pose_backend=pose_backend,
                           ransac_hypotheses=ransac_h),
                logger, mesh=mesh)
            tester.test(make_test_iter, rng=rng)
    if loader_stats.get("pairs_dropped"):
        logger.warning(
            f"{loader_stats['pairs_dropped']} pairs overflowed every bucket "
            f"and were dropped ({loader_stats['pairs_used']} used) — "
            "recalibrate with more calibration_pairs or larger headroom")


def run_2d3d(args, raw, mode, batch_size, dataset_name):
    """2D-3D task driver (RGB-D Scenes V2 / 7Scenes)."""
    import numpy as np

    from .engine.tester2d3d import Test2D3DConfig, TwoDThreeDTester
    from .models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from .nn.matching import MatchingConfig
    from .nn.point_backbone import PointBackboneConfig
    from .utils.logging import Logger

    m = raw.get("model_2d3d", {})
    ev = raw.get("eval", {})
    cfg = Pipeline2D3DConfig(
        img_out_dim=int(m.get("img_out_dim", 128)),
        img_base_dim=int(m.get("img_base_dim", 128)),
        pcd_backbone=PointBackboneConfig(
            output_dim=int(m.get("pcd_output_dim", 128)),
            init_dim=int(m.get("pcd_init_dim", 64))),
        hidden_dim=int(m.get("hidden_dim", 256)),
        output_dim=int(m.get("output_dim", 256)),
        num_heads=int(m.get("num_heads", 4)),
        matching=MatchingConfig(feature_dim=int(m.get("output_dim", 256))),
        coarse_stride=int(m.get("coarse_stride", 8)),
        pcd_num_points_in_patch=int(m.get("pcd_num_points_in_patch", 32)),
        pcd_min_node_size=int(m.get("pcd_min_node_size", 5)),
        sample_steps=int(raw.get("SAMPLE_STEP", 10)),
        use_dino=bool(m.get("use_dino", False)),
        use_mono_depth=bool(m.get("use_mono_depth", False)),
        dino_dim=int(m.get("dino_dim", 1024)),
        procrustes_max_condition=float(
            raw.get("procrustes", {}).get("max_condition_num", 200.0)),
    )
    model = DiffReg2D3D(cfg)

    save_dir = os.path.join("snapshot", raw.get("exp_dir", "run-2d3d"))
    logger = Logger(save_dir)
    logger.info(f"2D-3D task={dataset_name} mode={mode} steps={cfg.sample_steps}")

    data_root = raw.get("data_root", "")
    demo = args.demo or not (data_root and os.path.exists(data_root))
    rng = jax.random.PRNGKey(int(raw.get("seed", 0)))

    if demo:
        from .data.synthetic2d3d import synthetic_2d3d_batch

        logger.info("demo mode: synthetic image<->cloud pairs")

        def make_iter():
            for i in range(max(1, args.num_pairs // batch_size)):
                yield synthetic_2d3d_batch(
                    batch_size=batch_size, img_hw=(64, 96), n_points=512, seed=i,
                    # train demo exercises the full loss (overlap circle + fine)
                    with_full_gt=(mode == "train")), [{}] * batch_size

        probe = next(make_iter())[0]
    else:
        from .data.calibrate import calibrate_spec_2d3d
        from .data.collate2d3d import batch_2d3d, build_2d3d_sample
        from .data.datasets2d3d import (
            RGBDScenes2D3DPairDataset,
            SevenScenes2D3DPairDataset,
        )

        ds_cls = SevenScenes2D3DPairDataset if dataset_name == "7scenes" \
            else RGBDScenes2D3DPairDataset
        ds = ds_cls(data_root, "test" if mode == "test" else "train",
                    use_augmentation=(mode == "train"))

        # static shapes from the data, like the 3D branch: measure the cloud
        # pyramid over pairs spread across the dataset (reference
        # vision3d/utils/dataloader.py:42-70 calibrates the same histogram)
        n_calib = min(int(raw.get("calibration_pairs", 16)), len(ds))
        calib_idx = np.linspace(0, len(ds) - 1, n_calib).astype(int)
        spec = calibrate_spec_2d3d(
            [ds[int(i)]["points"] for i in calib_idx],
            init_radius=float(m.get("init_radius", 0.0625)))
        logger.info(f"calibrated 2d3d spec from {n_calib} pairs: {spec}")

        # frozen towers (converted checkpoints, tools/convert_towers.py)
        towers = None
        tw = raw.get("towers", {})
        if cfg.use_dino or cfg.use_mono_depth:
            from .models.towers import load_tower_runner

            dino_ckpt = tw.get("dinov2") if cfg.use_dino else None
            da_ckpt = tw.get("depth_anything") if cfg.use_mono_depth else None
            bad = (cfg.use_dino and not (dino_ckpt and os.path.exists(dino_ckpt))) \
                or (cfg.use_mono_depth and not (da_ckpt and os.path.exists(da_ckpt)))
            if bad:
                raise SystemExit(
                    "use_dino/use_mono_depth need converted tower checkpoints: "
                    f"towers={tw!r} (run tools/convert_towers.py)")
            towers = load_tower_runner(dino_ckpt, da_ckpt)

        def make_iter():
            buf, metas = [], []
            for i in range(len(ds)):
                raw_s = ds[i]
                # crop to stride-divisible window
                st = cfg.coarse_stride
                h = raw_s["depth"].shape[0] // st * st
                w = raw_s["depth"].shape[1] // st * st
                for k in ("depth", "image", "image_gray"):
                    raw_s[k] = raw_s[k][:h, :w]
                try:
                    sample = build_2d3d_sample(raw_s, spec, st)
                except ValueError:
                    continue
                if towers is not None:
                    rgb = raw_s["image"][None]
                    if cfg.use_dino:
                        sample["dino_feats"] = towers.dino_tokens(rgb)[0]
                    if cfg.use_mono_depth:
                        sample["mono_depth"] = towers.mono_depth(rgb)[0]
                buf.append(sample)
                metas.append(raw_s["scene_name"])
                if len(buf) == batch_size:
                    yield batch_2d3d(buf), metas
                    buf, metas = [], []

        probe = next(make_iter())[0]

    if mode == "train":
        from .engine import LossConfig, OptimConfig
        from .engine.losses2d3d import CircleLossConfig
        from .engine.train2d3d import create_train_state_2d3d, make_train_step_2d3d
        from .engine.trainer import Trainer, TrainerConfig
        from .utils.snapshot import backup_sources

        # master process only (same guard as the 3D train path): on a
        # shared save_dir a multi-host run would otherwise race copytree
        if jax.process_index() == 0:
            backup_sources(save_dir, args.config)

        from .engine.losses2d3d import FineLossConfig

        lc = raw.get("loss", {}).get("coarse_loss", {})
        fl = raw.get("loss", {}).get("fine_loss", {})
        circle_cfg = CircleLossConfig(
            positive_margin=float(lc.get("positive_margin", 0.1)),
            negative_margin=float(lc.get("negative_margin", 1.4)),
            positive_optimal=float(lc.get("positive_optimal", 0.1)),
            negative_optimal=float(lc.get("negative_optimal", 1.4)),
            log_scale=float(lc.get("log_scale", 40.0)),
            positive_overlap=float(lc.get("positive_overlap", 0.3)),
            negative_overlap=float(lc.get("negative_overlap", 0.2)),
        )
        fine_cfg = FineLossConfig(
            positive_radius_3d=float(fl.get("positive_radius_3d", 0.0375)),
            negative_radius_3d=float(fl.get("negative_radius_3d", 0.1)),
            positive_radius_2d=float(fl.get("positive_radius_2d", 8.0)),
            negative_radius_2d=float(fl.get("negative_radius_2d", 12.0)),
            circle=CircleLossConfig(log_scale=float(fl.get("log_scale", 24.0))),
        )
        # auto data-parallel, same policy as the 3D path (the reference
        # auto-DDPs this trainer: vision3d/engine/base_trainer.py:196-210).
        # lr scales with PROCESS count (each extra host adds a batch_size
        # slice to the global batch — linear scaling rule, same convention
        # as utils/config.py build_optim_config); in-process device sharding
        # splits a fixed global batch, so device count does not scale lr.
        hosts = jax.process_count()
        lr = float(raw.get("lr", 1e-4))
        if hosts > 1 and bool(raw.get("scale_lr_by_world", True)):
            lr *= hosts
        ocfg = OptimConfig(optimizer="adam", lr=lr)
        state = create_train_state_2d3d(model, probe, rng, ocfg)
        world = jax.device_count()
        if world > 1 and batch_size % world == 0:
            from .parallel.mesh import (
                make_mesh,
                make_parallel_train_step_2d3d,
                replicate,
            )

            mesh = make_mesh()
            logger.info(f"2d3d data-parallel mesh over {world} devices")
            state = replicate(state, mesh)
            step = make_parallel_train_step_2d3d(
                model, circle_cfg, LossConfig(), ocfg, mesh, fine_cfg=fine_cfg)
        else:
            if world > 1:
                logger.warning(
                    f"{world} devices but batch_size={batch_size} not "
                    "divisible — single-device; pick a divisible batch size")
            step = jax.jit(make_train_step_2d3d(
                model, circle_cfg, LossConfig(), ocfg, fine_cfg=fine_cfg))
        trainer = Trainer(step, state, lambda epoch: make_iter(),
                          TrainerConfig(max_epoch=int(raw.get("max_epoch", 10)),
                                        save_dir=save_dir),
                          logger=logger, rng=rng)
        if args.resume:
            trainer.resume()
        trainer.train()
        return

    variables = model.init({"params": rng}, probe, rng, mode="train")
    pretrain = raw.get("pretrain", "")
    if pretrain and os.path.exists(pretrain):
        from .engine.checkpoint import CheckpointManager

        restored = CheckpointManager(pretrain).restore(variables)
        if restored is not None:
            variables = restored
            logger.info(f"restored weights from {pretrain}")
        else:
            logger.warning("pretrain restore failed — metric run uses RANDOM weights")
    elif not demo:
        raise SystemExit(
            f"refusing a metric run on real data with random weights: "
            f"pretrain={pretrain!r} not found (use --demo for a smoke run)")
    pnp_backend = str(ev.get("pnp_backend", "device"))
    if pnp_backend == "opencv":
        from .eval.host_estimators import has_opencv

        if not has_opencv():
            logger.warning("eval.pnp_backend=opencv but cv2 is not installed "
                           "— falling back to the device PnP")
            pnp_backend = "device"
    test_cfg = Test2D3DConfig(
        acceptance_radius=float(ev.get("acceptance_radius", 0.05)),
        ir_threshold=float(ev.get("ir_threshold", 0.1)),
        rmse_threshold=float(ev.get("rmse_threshold", 0.1)),
        pnp_tolerance_px=float(ev.get("pnp_tolerance_px", 8.0)),
        pnp_backend=pnp_backend,
    )
    tester = TwoDThreeDTester(model, variables, test_cfg, logger)
    # reference protocol is two-stage: test.py writes the npz prediction
    # cache, eval.py re-scores it (possibly with a correspondence budget).
    # Real-data runs always cache; demo runs only when asked.
    cache_dir = ev.get("cache_dir") or (
        None if demo and not ev.get("write_cache", False)
        else os.path.join(save_dir, "cache"))
    tester.test(make_iter, rng=rng, cache_dir=cache_dir)
    if cache_dir is not None:
        from .engine.tester2d3d import eval_from_cache

        eval_from_cache(cache_dir, test_cfg, logger,
                        num_corr=ev.get("num_correspondences"), rng=rng)


if __name__ == "__main__":
    main()
