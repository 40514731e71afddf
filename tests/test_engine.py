"""Engine tests: losses, config loader, checkpointing, dataset readers."""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.engine import LossConfig, focal_correspondence_loss, match_recall_precision


class TestFocalLoss:
    def test_perfect_prediction_is_low(self):
        gt = jnp.zeros((1, 8, 8)).at[0, jnp.arange(8), jnp.arange(8)].set(1.0)
        valid = jnp.ones((1, 8, 8), bool)
        good = jnp.clip(gt, 0.01, 0.99)
        bad = jnp.clip(1.0 - gt, 0.01, 0.99)
        cfg = LossConfig()
        l_good = float(focal_correspondence_loss(good, gt, valid, cfg))
        l_bad = float(focal_correspondence_loss(bad, gt, valid, cfg))
        assert l_good < 0.01 * l_bad

    def test_padding_excluded(self):
        gt = jnp.zeros((1, 8, 8)).at[0, 0, 0].set(1.0)
        valid = jnp.zeros((1, 8, 8), bool).at[0, :4, :4].set(True)
        conf_pad_garbage = jnp.full((1, 8, 8), 0.999).at[0, :4, :4].set(0.01).at[0, 0, 0].set(0.9)
        cfg = LossConfig()
        l1 = float(focal_correspondence_loss(conf_pad_garbage, gt, valid, cfg))
        conf_pad_clean = jnp.full((1, 8, 8), 0.001).at[0, :4, :4].set(0.01).at[0, 0, 0].set(0.9)
        l2 = float(focal_correspondence_loss(conf_pad_clean, gt, valid, cfg))
        assert abs(l1 - l2) < 1e-7  # padding region cannot change the loss

    def test_no_positives_corner_case(self):
        gt = jnp.zeros((1, 6, 6))
        valid = jnp.ones((1, 6, 6), bool)
        conf = jnp.full((1, 6, 6), 0.3)
        out = float(focal_correspondence_loss(conf, gt, valid, LossConfig()))
        assert np.isfinite(out)

    def test_recall_precision(self):
        gt = jnp.zeros((1, 4, 4)).at[0, jnp.arange(4), jnp.arange(4)].set(1.0)
        pred = jnp.zeros((1, 4, 4), bool).at[0, 0, 0].set(True).at[0, 1, 1].set(True).at[0, 2, 3].set(True)
        r, p = match_recall_precision(gt, pred)
        assert float(r) == pytest.approx(0.5)
        assert float(p) == pytest.approx(2 / 3)


class TestConfigLoader:
    def test_load_reference_schema(self):
        from diffreg_tpu.utils.config import build_pipeline_config, load_yaml

        raw = load_yaml("configs/test/3dmatch.yaml")
        cfg = build_pipeline_config(raw)
        assert cfg.sample_steps == 20
        assert cfg.coarse_matching.feature_dim == 432
        assert cfg.coarse_transformer.layer_types == (
            "self", "cross", "positioning", "self", "cross")
        assert cfg.procrustes.max_condition_num == 0.0
        assert cfg.variant == "3dmatch"

    def test_4dmatch_deltas(self):
        from diffreg_tpu.utils.config import build_pipeline_config, load_yaml

        raw = load_yaml("configs/test/4dmatch.yaml")
        cfg = build_pipeline_config(raw)
        assert cfg.variant == "4dmatch"
        assert cfg.stochastic_ddim
        assert cfg.procrustes.use_masked_lengths


class TestCheckpoint:
    def test_roundtrip_and_best(self, tmp_path):
        from diffreg_tpu.engine.checkpoint import CheckpointManager

        state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mgr.save(1, state, {"recall": 0.5, "loss": 1.0})
        state2 = {"w": state["w"] * 2, "step": jnp.asarray(4)}
        mgr.save(2, state2, {"recall": 0.4, "loss": 0.5})
        assert mgr.best_step("recall") == 1
        assert mgr.best_step("loss") == 2
        restored = mgr.restore(jax.tree.map(jnp.zeros_like, state))
        np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(state2["w"]))
        mgr.close()


class TestDatasets:
    def test_3dmatch_reader(self, tmp_path, rng):
        from diffreg_tpu.data.datasets import ThreeDMatchPairDataset

        root = tmp_path / "indoor"
        os.makedirs(root)
        src = rng.rand(500, 3).astype(np.float32)
        tgt = rng.rand(400, 3).astype(np.float32)
        np.save(root / "src0.npy", src)
        np.save(root / "tgt0.npy", tgt)
        infos = {
            "rot": [np.eye(3, dtype=np.float32)],
            "trans": [np.zeros((3, 1), np.float32)],
            "src": ["src0.npy"],
            "tgt": ["tgt0.npy"],
            "gt_cov": [np.eye(6, dtype=np.float32)],
        }
        info_path = tmp_path / "info.pkl"
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)

        ds = ThreeDMatchPairDataset(str(info_path), str(root), augment=False)
        assert len(ds) == 1
        s = ds[0]
        np.testing.assert_allclose(s["src_pcd"], src)
        assert s["gt_cov"].shape == (6, 6)

        # with augmentation the GT transform still maps src onto tgt frame
        ds_aug = ThreeDMatchPairDataset(str(info_path), str(root), augment=True, seed=1)
        s2 = ds_aug[0]
        warped = s2["src_pcd"] @ s2["rot"].T + s2["trn"].reshape(1, 3)
        # original pair: identity; augmentation preserves correspondence geometry
        d = np.linalg.norm(warped - s2["tgt_pcd"][: len(warped)], axis=1) if len(warped) <= len(s2["tgt_pcd"]) else None
        # structural check only: rotation is orthonormal
        np.testing.assert_allclose(s2["rot"] @ s2["rot"].T, np.eye(3), atol=1e-5)

    def test_4dmatch_reader(self, tmp_path, rng):
        from diffreg_tpu.data.datasets import FourDMatchPairDataset

        d = tmp_path / "4d"
        os.makedirs(d)
        np.savez(d / "pair0.npz",
                 src_pcd=rng.rand(300, 3).astype(np.float32),
                 tgt_pcd=rng.rand(280, 3).astype(np.float32),
                 s2t_flow=rng.rand(300, 3).astype(np.float32) * 0.05,
                 rot=np.eye(3, dtype=np.float32),
                 trans=np.zeros((3, 1), np.float32),
                 metric_index=np.arange(50))
        ds = FourDMatchPairDataset(str(d))
        assert len(ds) == 1
        s = ds[0]
        assert s["scene_flow"].shape == (300, 3)
        assert s["metric_index"].shape == (50,)

    def test_4dmatch_reader_reference_keys(self, tmp_path, rng):
        """The released benchmark entries store s_pc/t_pc (_4dmatch.py:73-74)."""
        from diffreg_tpu.data.datasets import FourDMatchPairDataset

        d = tmp_path / "4dref"
        os.makedirs(d)
        np.savez(d / "pair0.npz",
                 s_pc=rng.rand(120, 3).astype(np.float32),
                 t_pc=rng.rand(110, 3).astype(np.float32),
                 s2t_flow=rng.rand(120, 3).astype(np.float32) * 0.05,
                 rot=np.eye(3, dtype=np.float32),
                 trans=np.zeros((3, 1), np.float32),
                 metric_index=np.arange(30)[None])  # squeezed like the reference
        s = FourDMatchPairDataset(str(d))[0]
        assert s["src_pcd"].shape == (120, 3)
        assert s["metric_index"].shape == (30,)

    def test_4dmatch_augmentation_preserves_gt(self, tmp_path, rng):
        """Train aug parity (_4dmatch.py:109-123): after the random one-sided
        SO(3) + noise, rot @ (src + flow) + trn must still land on the
        matching target points within the aug-noise budget, and the rotation
        must actually move one side."""
        from diffreg_tpu.data.datasets import FourDMatchPairDataset

        src = rng.rand(200, 3).astype(np.float32)
        flow = (rng.rand(200, 3).astype(np.float32) - 0.5) * 0.1
        axis = np.array([0.2, 0.9, -0.4]); axis /= np.linalg.norm(axis)
        ang = 0.8
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
        rot = (np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)).astype(np.float32)
        trn = np.array([[0.3], [-0.2], [0.5]], np.float32)
        tgt = ((src + flow) @ rot.T + trn.T).astype(np.float32)

        d = tmp_path / "4daug"
        os.makedirs(d)
        np.savez(d / "pair0.npz", s_pc=src, t_pc=tgt, s2t_flow=flow,
                 rot=rot, trans=trn)
        noise = 0.002
        moved = False
        for seed in range(4):
            ds = FourDMatchPairDataset(str(d), augment=True,
                                       augment_noise=noise, seed=seed)
            s = ds[0]
            warped = (s["src_pcd"] + s["scene_flow"]) @ s["rot"].T + s["trn"].T
            err = np.linalg.norm(warped - s["tgt_pcd"], axis=1)
            # exact up to the target-side uniform noise (+/- noise/2 per axis)
            assert err.max() < noise * 2.0, err.max()
            moved |= np.abs(s["src_pcd"] - src).max() > 0.05 \
                or np.abs(s["tgt_pcd"] - tgt).max() > 0.05
        assert moved  # the SO(3) rotation must actually be applied

    def test_iterate_batches(self, tmp_path, rng):
        from diffreg_tpu.data import PyramidConfig, tiny_spec
        from diffreg_tpu.data.datasets import iterate_batches

        class FakeDS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                r = np.random.RandomState(i)
                return {"src_pcd": r.rand(100, 3).astype(np.float32),
                        "tgt_pcd": r.rand(90, 3).astype(np.float32),
                        "rot": np.eye(3, dtype=np.float32),
                        "trn": np.zeros((3, 1), np.float32),
                        "gt_cov": None, "scene_flow": None, "metric_index": None}

        spec = tiny_spec(128)
        cfg = PyramidConfig(first_subsampling_dl=0.06, coarse_match_radius=0.15)
        batches = list(iterate_batches(FakeDS(), spec, cfg, batch_size=2))
        assert len(batches) == 2  # 2 + 1
        assert batches[0][0].features.shape[0] == 2


class TestCalibration:
    def test_calibrate_spec(self, rng):
        from diffreg_tpu.data import PyramidConfig
        from diffreg_tpu.data.calibrate import calibrate_spec

        pairs = [(rng.rand(400, 3).astype(np.float32), rng.rand(380, 3).astype(np.float32))
                 for _ in range(2)]
        cfg = PyramidConfig(first_subsampling_dl=0.06)
        spec = calibrate_spec(pairs, cfg)
        assert spec.n_points[0] >= 780
        assert all(k >= 1 for k in spec.k_neighbors)
        assert spec.n_src > 0 and spec.n_tgt > 0

    def test_neighbor_percentile_monotone(self, rng):
        # lowering the histogram percentile can only shrink the static K
        # (the 80th-percentile-K perf lever, tools/percentile_k_experiment.py)
        from diffreg_tpu.data import PyramidConfig
        from diffreg_tpu.data.calibrate import calibrate_spec

        pairs = [(rng.rand(400, 3).astype(np.float32),
                  rng.rand(380, 3).astype(np.float32)) for _ in range(2)]
        cfg = PyramidConfig(first_subsampling_dl=0.06)
        lo = calibrate_spec(pairs, cfg, neighbor_percentile=50.0)
        hi = calibrate_spec(pairs, cfg, neighbor_percentile=99.0)
        assert all(a <= b for a, b in zip(lo.k_neighbors, hi.k_neighbors))
        assert all(a <= b for a, b in zip(lo.k_pools, hi.k_pools))
        assert any(a < b for a, b in zip(lo.k_neighbors, hi.k_neighbors))
        # padded point/token sizes do not depend on the percentile
        assert lo.n_points == hi.n_points and lo.n_src == hi.n_src

    def test_percentile_experiment_geometric_gate(self):
        # the tool's geometric gate runs standalone (pure numpy/scipy) and
        # reports less influence mass lost than rows dropped — truncation
        # removes the farthest (least-influential) neighbors first
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from percentile_k_experiment import geometric_gate

        _, specP, geo = geometric_gate(80.0, n_pairs=1, n_points=1024,
                                       queries_per_cloud=64)
        assert geo["rows_pct"] <= geo["rows_90"]
        for lv in geo["levels"]:
            assert lv["mass_lost_mean"] <= lv["rows_dropped_mean"] + 1e-9


class TestBucketedLoading:
    def test_pairs_route_to_fitting_bucket(self, rng):
        from diffreg_tpu.data import PyramidConfig, ShapeSpec
        from diffreg_tpu.data.datasets import iterate_batches

        class MixedDS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                r = np.random.RandomState(i)
                n = 60 if i % 2 == 0 else 220  # small and large pairs
                return {"src_pcd": r.rand(n, 3).astype(np.float32),
                        "tgt_pcd": r.rand(n, 3).astype(np.float32),
                        "rot": np.eye(3, dtype=np.float32),
                        "trn": np.zeros((3, 1), np.float32),
                        "gt_cov": None, "scene_flow": None, "metric_index": None}

        cfg = PyramidConfig(first_subsampling_dl=0.06, coarse_match_radius=0.15)

        def spec(cap):
            return ShapeSpec(n_points=(cap,) * 4, k_neighbors=(16,) * 4,
                             k_pools=(16,) * 3, k_upsamples=(4,) * 3,
                             n_src=cap // 2, n_tgt=cap // 2, n_gt_matches=32)

        small, large = spec(160), spec(512)
        batches = list(iterate_batches(MixedDS(), [small, large], cfg, batch_size=2))
        sizes = sorted(b[0].features.shape[1] for b in batches)
        assert sizes == [160, 512]  # one batch per bucket
        for b, _ in batches:
            assert b.features.shape[0] == 2


class TestContextManager:
    def test_scoped_registry(self):
        from diffreg_tpu.utils.context import ContextManager

        cm = ContextManager()
        cm.register("a", 1)
        assert cm.get("a") == 1 and cm.exists("a")
        cm.set_scope("other")
        assert not cm.exists("a")
        cm.register("a", 2)
        assert cm.get("a") == 2
        assert cm.get("a", scope="default") == 1
        cm.delete_scope("other")
        assert cm.get_scope() == "default"
        with pytest.raises(ValueError):
            cm.delete_scope("default")


class TestEvalStep:
    def test_val_loss_without_update(self):
        import jax

        from diffreg_tpu.data import synthetic_batch
        from diffreg_tpu.engine import (LossConfig, OptimConfig,
                                        create_train_state, make_eval_step)
        from diffreg_tpu.models import DiffusionMatchingModel
        from diffreg_tpu.models.presets import preset_tiny

        batch, _, _ = synthetic_batch(batch_size=1, n_points=64, seed=0)
        model = DiffusionMatchingModel(preset_tiny("3dmatch", sample_steps=1))
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, batch, rng,
                                   OptimConfig(optimizer="adam", lr=1e-4))
        info = jax.jit(make_eval_step(model, LossConfig()))(state, batch, rng)
        assert np.isfinite(float(info["loss"]))


class TestNonFiniteGradSkip:
    def test_nan_batch_skips_update(self):
        """Reference validate_gradient semantics (lib/utils.py:96-107): a
        non-finite gradient leaves params AND optimizer state untouched."""
        import jax
        import jax.numpy as jnp

        from diffreg_tpu.data import synthetic_batch
        from diffreg_tpu.engine import (LossConfig, OptimConfig,
                                        create_train_state, make_train_step)
        from diffreg_tpu.models import DiffusionMatchingModel
        from diffreg_tpu.models.presets import preset_tiny

        batch, _, _ = synthetic_batch(batch_size=1, n_points=64, seed=0)
        model = DiffusionMatchingModel(preset_tiny("3dmatch", sample_steps=1))
        rng = jax.random.PRNGKey(0)
        ocfg = OptimConfig(optimizer="sgd", lr=0.1)
        state = create_train_state(model, batch, rng, ocfg)
        step = jax.jit(make_train_step(model, LossConfig(), ocfg))

        bad = batch._replace(features=batch.features.at[0, 0, 0].set(jnp.nan))
        new_state, info = step(state, bad, rng)
        assert not bool(info["grads_finite"])
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # sanity: a clean batch DOES update
        new_state2, info2 = step(state, batch, rng)
        assert bool(info2["grads_finite"])
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(state.params),
                                 jax.tree.leaves(new_state2.params))]
        assert max(diffs) > 0


class TestConfigFastPath:
    def test_compute_dtype_plumbed(self):
        from diffreg_tpu.utils.config import build_pipeline_config, load_yaml

        raw = load_yaml("configs/test/3dmatch_fast.yaml")
        cfg = build_pipeline_config(raw)
        assert cfg.kpfcn.compute_dtype == "bfloat16"
        assert cfg.coarse_transformer.compute_dtype == "bfloat16"
        raw2 = load_yaml("configs/test/3dmatch.yaml")
        cfg2 = build_pipeline_config(raw2)
        assert cfg2.kpfcn.compute_dtype is None


class TestIterBasedTrainer:
    def test_fixed_iters_per_epoch_with_cycling_loader(self, tmp_path):
        """vision3d IterBasedTrainer twin: pseudo-epochs of fixed length over
        a cycling loader; the loader restarts with an advanced epoch index."""
        import jax

        from diffreg_tpu.data import synthetic_batch
        from diffreg_tpu.engine import (LossConfig, OptimConfig,
                                        create_train_state, make_train_step)
        from diffreg_tpu.engine.trainer import (CycleIterator, IterBasedTrainer,
                                                TrainerConfig)
        from diffreg_tpu.models import DiffusionMatchingModel
        from diffreg_tpu.models.presets import preset_tiny

        batch, _, _ = synthetic_batch(batch_size=1, n_points=64, seed=0)
        model = DiffusionMatchingModel(preset_tiny("3dmatch", sample_steps=1))
        rng = jax.random.PRNGKey(0)
        ocfg = OptimConfig(optimizer="sgd", lr=1e-3)
        state = create_train_state(model, batch, rng, ocfg)
        step = jax.jit(make_train_step(model, LossConfig(), ocfg))

        epochs_seen = []

        def make_iter(epoch):
            epochs_seen.append(epoch)
            return iter([(batch, None), (batch, None)])   # 2 batches/epoch

        trainer = IterBasedTrainer(
            step, state, make_iter,
            TrainerConfig(max_epoch=2, log_every=3,
                          save_dir=str(tmp_path / "run")),
            num_iters_per_epoch=5)
        out_state = trainer.train()
        # 2 pseudo-epochs x 5 iters = 10 pulls over a 2-batch loader
        # -> underlying loader restarted 5 times total (epochs 0..4)
        assert epochs_seen == [0, 1, 2, 3, 4]
        assert trainer.ckpt.latest_step() == 2
        d0 = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
              for a, b in zip(jax.tree.leaves(state.params),
                              jax.tree.leaves(out_state.params))]
        assert max(d0) > 0.0

    def test_cycle_iterator_restarts(self):
        from diffreg_tpu.engine.trainer import CycleIterator

        it = CycleIterator(lambda e: iter([e * 10, e * 10 + 1]), epoch=0)
        got = [next(it) for _ in range(5)]
        assert got == [0, 1, 10, 11, 20]


class TestBatchTester:
    def test_per_sample_eval_rows(self):
        """vision3d BatchTester twin: one batched forward, per-sample host
        eval rows aggregated into the summary."""
        import jax.numpy as jnp

        from diffreg_tpu.engine.trainer import BatchTester

        def forward(batch, rng):
            return {"pred": batch["x"] * 2.0}

        def eval_sample(i, batch, out, meta):
            return {"err": float(jnp.abs(out["pred"][i] - batch["y"][i]))}

        batches = [({"x": jnp.asarray([1.0, 2.0]), "y": jnp.asarray([2.0, 5.0])},
                    ["a", "b"]),
                   ({"x": jnp.asarray([3.0]), "y": jnp.asarray([6.0])}, ["c"])]
        tester = BatchTester(forward, eval_sample,
                             batch_size_of=lambda b: b["x"].shape[0])
        summary = tester.test(lambda: iter(batches))
        assert summary["samples"] == 3
        np.testing.assert_allclose(summary["err"], (0.0 + 1.0 + 0.0) / 3)


class TestWarmupSchedules:
    """warmup_annealing_schedule vs a straight reimplementation of the
    reference WarmUp*AnnealingFunction formulas (optimizer.py:13-74)."""

    @staticmethod
    def _ref(kind, k, warmup, total, gamma, step_size, eta_init, eta_min):
        # torch LambdaLR hands last_epoch=k; reference uses next_step=k+1
        next_step = k + 1
        if next_step < warmup:
            return eta_init + (1.0 - eta_init) / warmup * next_step
        d = next_step - warmup
        if kind == "warmup_exponential":
            return max(gamma ** ((d + 1) // step_size), eta_min)
        if next_step > total:
            return eta_min
        if kind == "warmup_cosine":
            return eta_min + 0.5 * (1 - eta_min) * (1 + np.cos(np.pi * d / (total - warmup)))
        return eta_min + (1 - eta_min) * (1.0 - d / (total - warmup))

    @pytest.mark.parametrize("kind", ["warmup_exponential", "warmup_cosine",
                                      "warmup_linear"])
    def test_matches_reference_formula(self, kind):
        from diffreg_tpu.engine import warmup_annealing_schedule

        sched = warmup_annealing_schedule(kind, base_lr=0.01, warmup_steps=10,
                                          total_steps=100, gamma=0.9,
                                          step_size=20, eta_init=0.1,
                                          eta_min=0.05)
        for k in [0, 1, 5, 9, 10, 30, 55, 99, 120]:
            want = 0.01 * self._ref(kind, k, 10, 100, 0.9, 20, 0.1, 0.05)
            np.testing.assert_allclose(float(sched(k)), want, rtol=1e-6,
                                       err_msg=f"{kind} step {k}")

    def test_wired_into_optimizer(self):
        from diffreg_tpu.engine import OptimConfig, make_optimizer

        cfg = OptimConfig(optimizer="adam", lr=1e-3,
                          scheduler="warmup_cosine", warmup_steps=5,
                          total_steps=50)
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


class TestSourceBackup:
    """Train-time source backup twin (reference main.py:66-74)."""

    def test_backup_sources(self, tmp_path):
        from diffreg_tpu.utils.snapshot import backup_sources

        dst = backup_sources(str(tmp_path), config_path=None)
        assert os.path.isdir(os.path.join(dst, "diffreg_tpu"))
        assert os.path.isfile(os.path.join(dst, "diffreg_tpu", "main.py"))
        assert os.path.isdir(os.path.join(dst, "configs"))
        # no bytecode/artifacts in the archive
        for root, dirs, files in os.walk(dst):
            assert "__pycache__" not in dirs
            assert not [f for f in files if f.endswith((".pyc", ".so"))]

    def test_idempotent_on_resume(self, tmp_path):
        from diffreg_tpu.utils.snapshot import backup_sources

        dst = backup_sources(str(tmp_path))
        marker = os.path.join(dst, "marker")
        with open(marker, "w") as f:
            f.write("started-run code")
        assert backup_sources(str(tmp_path)) == dst
        assert os.path.exists(marker), "resume must not clobber the backup"

    def test_copies_the_run_yaml(self, tmp_path):
        from diffreg_tpu.utils.snapshot import backup_sources

        cfg = tmp_path / "exp.yaml"
        cfg.write_text("exp_dir: x\n")
        out = tmp_path / "run"
        dst = backup_sources(str(out), str(cfg))
        assert os.path.isfile(os.path.join(dst, "exp.yaml"))
