"""2D-3D pipeline tests: batch generator, forward branches, components."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
from diffreg_tpu.nn.matching import MatchingConfig
from diffreg_tpu.nn.point_backbone import PointBackboneConfig


@pytest.fixture(scope="module")
def setup_2d3d():
    batch = synthetic_2d3d_batch(batch_size=1, img_hw=(32, 48), n_points=160, seed=0)
    cfg = Pipeline2D3DConfig(
        img_out_dim=32, img_base_dim=16,
        pcd_backbone=PointBackboneConfig(output_dim=32, init_dim=16,
                                         init_radius=0.1, init_sigma=0.08),
        hidden_dim=64, output_dim=64, num_heads=2,
        matching=MatchingConfig(feature_dim=64), sample_steps=2)
    model = DiffReg2D3D(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b, r: model.init({"params": r}, b, r, mode="train"))(batch, rng)
    return batch, model, variables


class TestPipeline2D3D:
    def test_train_branch(self, setup_2d3d):
        batch, model, variables = setup_2d3d
        out = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="train"))(
            variables, batch, jax.random.PRNGKey(1))
        assert bool(jnp.all(jnp.isfinite(out["conf_matrix_gt_hat"])))
        assert float(out["matrix_gt"].sum()) > 0
        # conf outside valid regions ~ 0
        valid = out["node_masks"][:, :, None] & out["img_valid_c"][:, None, :]
        assert float(jnp.where(valid, 0.0, out["conf_matrix_pred"]).max()) < 1e-5

    def test_ddim_branch(self, setup_2d3d):
        batch, model, variables = setup_2d3d
        out = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="ddim"))(
            variables, batch, jax.random.PRNGKey(2))
        assert bool(jnp.all(jnp.isfinite(out["conf_matrix_pred"])))
        assert int(out["corr_mask"].sum()) > 0

    def test_backbone_branch(self, setup_2d3d):
        batch, model, variables = setup_2d3d
        out = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="backbone"))(
            variables, batch, jax.random.PRNGKey(3))
        assert int(out["corr_mask"].sum()) > 0

    def test_patch_centers_match_camera_geometry(self, setup_2d3d):
        """Patch centers = means of the STRIDE-2 pixel subset of valid
        back-projected points per patch (reference patchify(..., stride=2),
        utils.py:44-46; value-parity in test_pipeline2d3d_parity)."""
        batch, model, variables = setup_2d3d
        out = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="backbone"))(
            variables, batch, jax.random.PRNGKey(4))
        centers = np.asarray(out["patch_centers"][0])
        h, w = 32, 48
        s = 8
        pts = np.asarray(batch.img_points[0]).reshape(h, w, 3)
        ref = pts.reshape(h // s, s, w // s, s, 3)[:, ::2, :, ::2]
        ref = ref.transpose(0, 2, 1, 3, 4).reshape(-1, (s // 2) ** 2, 3).mean(axis=1)
        np.testing.assert_allclose(centers, ref, atol=1e-4)


class TestImageBackbone:
    def test_output_pyramid(self, rng):
        from diffreg_tpu.nn.image_backbone import ImageBackbone

        model = ImageBackbone(out_channels=16, base_channels=8)
        x = jnp.asarray(rng.rand(1, 32, 48, 1).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(vars_, x)
        assert feats[0].shape == (1, 32, 48, 16)    # fine 1/1
        assert feats[1].shape == (1, 16, 24, 8)     # 1/2
        assert feats[2].shape == (1, 8, 12, 16)     # 1/4
        assert feats[3].shape == (1, 4, 6, 32)      # 1/8

    def test_dino_injection_changes_output(self, rng):
        from diffreg_tpu.nn.image_backbone import ImageBackbone

        model = ImageBackbone(out_channels=16, base_channels=8)
        x = jnp.asarray(rng.rand(1, 32, 48, 1).astype(np.float32))
        dino = jnp.asarray(rng.rand(1, 3, 4, 32).astype(np.float32))
        vars_ = model.init(jax.random.PRNGKey(0), x, dino)
        with_dino = model.apply(vars_, x, dino)
        without = model.apply(vars_, x, jnp.zeros_like(dino))
        assert float(jnp.abs(with_dino[3] - without[3]).max()) > 1e-4


class TestFourier:
    def test_embedding_shape_and_layout(self):
        from diffreg_tpu.nn.layers2d3d import fourier_embedding

        x = jnp.asarray(np.array([[0.5, -0.25]], np.float32))
        emb = fourier_embedding(x, length=10, use_pi=False, use_input=True)
        assert emb.shape == (1, 10 * 4 + 2)  # matches img_emb_proj input dim
        np.testing.assert_allclose(np.asarray(emb[0, :2]), [0.5, -0.25])
        # first frequency block: sin(2^0 * x) per dim
        np.testing.assert_allclose(np.asarray(emb[0, 2:4]),
                                   np.sin([0.5, -0.25]), atol=1e-6)

    def test_3d_dims(self):
        from diffreg_tpu.nn.layers2d3d import fourier_embedding

        x = jnp.zeros((2, 7, 3))
        emb = fourier_embedding(x, length=10)
        assert emb.shape == (2, 7, 10 * 6 + 3)  # matches pcd_emb_proj input dim


class TestFrozenTowerPaths:
    """use_dino / use_mono_depth end-to-end (VERDICT item 5): only weight
    files should be missing — the paths themselves run and train."""

    @pytest.mark.slow
    def test_dino_and_mono_depth_train_and_ddim(self):
        from diffreg_tpu.engine import LossConfig, OptimConfig
        from diffreg_tpu.engine.losses2d3d import CircleLossConfig
        from diffreg_tpu.engine.train2d3d import create_train_state_2d3d, make_train_step_2d3d

        dino_dim = 64
        batch = synthetic_2d3d_batch(batch_size=1, img_hw=(56, 56), n_points=128,
                                     seed=0, coarse_stride=14,
                                     with_dino=True, dino_dim=dino_dim,
                                     with_mono_depth=True)
        assert batch.dino_feats is not None and batch.mono_depth is not None
        cfg = Pipeline2D3DConfig(
            img_out_dim=16, img_base_dim=16,
            pcd_backbone=PointBackboneConfig(output_dim=16, init_dim=8,
                                             init_radius=0.1, init_sigma=0.08),
            hidden_dim=32, output_dim=32, num_heads=2,
            matching=MatchingConfig(feature_dim=32), sample_steps=1,
            coarse_stride=14, use_dino=True, use_mono_depth=True,
            dino_dim=dino_dim,
            # accept every finite Procrustes solution so the warp (and the
            # depth-affine gradient) is active at random init — with the
            # reference gate (200) an ill-conditioned init solution falls
            # back to identity and coffa correctly gets zero gradient
            procrustes_max_condition=1e9)
        model = DiffReg2D3D(cfg)
        rng = jax.random.PRNGKey(0)

        # the learnable depth affine exists and the train step runs finite
        ocfg = OptimConfig(optimizer="adam", lr=1e-3)
        state = create_train_state_2d3d(model, batch, rng, ocfg)
        assert "depth_coffa" in state.params and "depth_coffb" in state.params
        step = jax.jit(make_train_step_2d3d(model, CircleLossConfig(),
                                            LossConfig(), ocfg))
        state, info = step(state, batch, rng)
        assert bool(info["grads_finite"])
        assert np.isfinite(float(info["loss"]))

        # the affine is differentiable through lift -> procrustes -> warp
        # (through the full focal loss the gradient is ~1e-8 at random init
        # and underflows f32, so probe the warp directly)
        rest = {"buffers": state.buffers}

        def warp_probe(params):
            def run(mdl):
                hc = wc = 56 // 14
                nodes = batch.points[-1]
                _, _, da_centers, da_valid = mdl._patch_centers(batch, hc, wc)
                x = jax.random.normal(jax.random.PRNGKey(0),
                                      (1, nodes.shape[1], hc * wc))
                w = mdl._warp_nodes(x, nodes, da_centers,
                                    batch.masks[-1], da_valid)
                return jnp.sum(w)
            return model.apply({"params": params, **rest}, method=run)

        g = jax.grad(warp_probe)(state.params)
        assert float(np.abs(np.asarray(g["depth_coffa"]))[0]) > 0.0, \
            "depth_coffa got no gradient through the warp"

        # ddim + backbone branches run with the towers on
        variables = {"params": state.params, "buffers": state.buffers}
        out = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="ddim"))(
            variables, batch, rng)
        assert np.isfinite(np.asarray(out["conf_matrix_pred"])).all()


class TestTraining2D3D:
    @pytest.mark.slow
    def test_loss_decreases(self, setup_2d3d):
        from diffreg_tpu.engine import LossConfig, OptimConfig
        from diffreg_tpu.engine.losses2d3d import CircleLossConfig
        from diffreg_tpu.engine.train2d3d import create_train_state_2d3d, make_train_step_2d3d

        batch, model, variables = setup_2d3d
        ocfg = OptimConfig(optimizer="adam", lr=5e-4)
        state = create_train_state_2d3d(model, batch, jax.random.PRNGKey(0), ocfg)
        step = jax.jit(make_train_step_2d3d(model, CircleLossConfig(), LossConfig(), ocfg))
        losses = []
        for i in range(6):
            state, info = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(info["loss"]))
            assert bool(info["grads_finite"])
        assert losses[-1] < losses[0], losses

    @pytest.mark.slow
    def test_full_gt_loss_trains(self):
        """Overlap-ratio circle GT + fine circle loss: one step, finite
        grads, all loss terms present (reference OverallLoss parity)."""
        from diffreg_tpu.engine import LossConfig, OptimConfig
        from diffreg_tpu.engine.losses2d3d import CircleLossConfig, FineLossConfig
        from diffreg_tpu.engine.train2d3d import create_train_state_2d3d, make_train_step_2d3d

        batch = synthetic_2d3d_batch(batch_size=1, img_hw=(32, 48), n_points=160,
                                     seed=0, with_full_gt=True, n_overlap=128,
                                     n_fine_gt=32)
        assert bool(np.asarray(batch.ov_valid).any())
        assert bool(np.asarray(batch.fine_valid).any())
        cfg = Pipeline2D3DConfig(
            img_out_dim=16, img_base_dim=16,
            pcd_backbone=PointBackboneConfig(output_dim=16, init_dim=8,
                                             init_radius=0.1, init_sigma=0.08),
            hidden_dim=32, output_dim=32, num_heads=2,
            matching=MatchingConfig(feature_dim=32), sample_steps=1)
        model = DiffReg2D3D(cfg)
        ocfg = OptimConfig(optimizer="adam", lr=1e-3)
        state = create_train_state_2d3d(model, batch, jax.random.PRNGKey(0), ocfg)
        step = jax.jit(make_train_step_2d3d(
            model, CircleLossConfig(), LossConfig(), ocfg,
            fine_cfg=FineLossConfig()))
        state, info = step(state, batch, jax.random.PRNGKey(1))
        for k in ("circle", "gt_hat", "fine", "fine_recall", "focal"):
            assert k in info, k
        assert bool(info["grads_finite"])
        assert np.isfinite(float(info["loss"]))
        # reference total excludes the plain focal term (loss.py:226-238)
        np.testing.assert_allclose(
            float(info["loss"]),
            float(info["circle"]) + float(info["gt_hat"]) + float(info["fine"]),
            rtol=1e-5)
