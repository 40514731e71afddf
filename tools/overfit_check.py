"""Overfit sanity run: can the full diffusion pipeline learn to register?

Trains a small-but-real model on a fixed set of synthetic pairs and reports
IR / rotation error of the DDIM-sampled matches before vs after training.
This is the framework's strongest end-to-end correctness evidence absent
the released reference weights (zero-egress environment).

Run: python tools/overfit_check.py [steps] [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tunnel-down escape hatch (see ROADMAP "Known environment quirks")
if os.environ.get("DIFFREG_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import dataclasses

    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine import LossConfig, OptimConfig, create_train_state, make_train_step
    from diffreg_tpu.eval import inlier_ratio, ransac_pose
    from diffreg_tpu.geometry import rotation_error_deg
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.select import extract_correspondences

    batch, spec, _ = synthetic_batch(batch_size=n_pairs, n_points=512, seed=7)

    # env hooks mirror bench.py so the bench configuration's ACCURACY can be
    # validated end-to-end: DIFFREG_PRECISION (matmul policy),
    # DIFFREG_COMPUTE_DTYPE (conv gather dtype), DIFFREG_CONDITION
    # (procrustes gate; 40 = warp-active like the 4DMatch configs)
    prec = os.environ.get("DIFFREG_PRECISION")
    if prec:
        from diffreg_tpu.utils.precision import set_precision

        set_precision(prec)
    cdt = os.environ.get("DIFFREG_COMPUTE_DTYPE") or None
    cond = float(os.environ.get("DIFFREG_CONDITION", "0"))

    base = preset_3dmatch(sample_steps=10)
    matching = dataclasses.replace(base.coarse_matching, feature_dim=96)
    proc = dataclasses.replace(base.coarse_transformer.procrustes,
                               max_condition_num=cond) if cond else \
        base.coarse_transformer.procrustes
    transformer = dataclasses.replace(
        base.coarse_transformer, feature_dim=96, n_head=4,
        feature_matching=matching, procrustes=proc, flash_attention=False,
        compute_dtype=cdt)
    kpfcn = dataclasses.replace(base.kpfcn, first_feats_dim=64, coarse_feature_dim=96,
                                fine_feature_dim=32, first_subsampling_dl=0.06,
                                compute_dtype=cdt)
    cfg = dataclasses.replace(base, kpfcn=kpfcn, coarse_transformer=transformer,
                              coarse_matching=matching, procrustes=proc)
    model = DiffusionMatchingModel(cfg)

    rng = jax.random.PRNGKey(0)
    ocfg = OptimConfig(optimizer="adam", lr=1e-3, steps_per_epoch=10**9)
    state = create_train_state(model, batch, rng, ocfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"model params: {n_params/1e6:.2f}M; pairs: {n_pairs}; steps: {n_steps}")

    step = jax.jit(make_train_step(model, LossConfig(), ocfg))

    # ONE jit for the whole evaluation: eager per-pair loops dispatch
    # op-by-op through the tunnel (~30 ms/op) and take minutes
    def _eval(variables, batch, mode):
        out = model.apply(variables, batch, jax.random.PRNGKey(99), mode=mode)

        def one(conf, mask, s_pcd, t_pcd, rot_gt, trn_gt):
            corrs = extract_correspondences(mask, conf, 512)
            ir = inlier_ratio(s_pcd[corrs.src_idx], t_pcd[corrs.tgt_idx],
                              corrs.valid, rot_gt, trn_gt[:, 0], inlier_thr=0.1)
            res = ransac_pose(jax.random.PRNGKey(7), s_pcd[corrs.src_idx],
                              t_pcd[corrs.tgt_idx], corrs.valid,
                              distance_threshold=0.05, num_hypotheses=4096)
            rre = rotation_error_deg(res.rotation[None], rot_gt[None])[0]
            return ir, rre

        return jax.vmap(one)(out["conf_matrix_pred"], out["corr_mask"],
                             out["s_pcd"], out["t_pcd"],
                             batch.rot_gt, batch.trn_gt)

    eval_ddim = jax.jit(lambda v, b: _eval(v, b, "ddim"))
    eval_bb = jax.jit(lambda v, b: _eval(v, b, "backbone"))

    def evaluate(variables, tag, mode="ddim"):
        irs, rres = (eval_ddim if mode == "ddim" else eval_bb)(variables, batch)
        irs, rres = np.asarray(irs), np.asarray(rres)
        # registration success via on-device RANSAC (the metric that matters:
        # top-1 union extraction includes non-overlap argmaxes by reference
        # design, so raw IR is bounded ~overlap fraction — reference 3DMatch
        # IR is ~31% at RR 95%)
        success = np.mean(rres < 5.0)
        print(f"{tag} [{mode}]: IR mean={np.mean(irs):.3f}, RANSAC RRE "
              f"{np.round(rres,1)} deg, success@5deg={success:.2f}", flush=True)
        return np.mean(irs), success

    variables = {"params": state.params, "buffers": state.buffers}
    ir0, succ0 = evaluate(variables, "before training")

    t0 = time.time()
    # pre-derived step keys: per-iteration fold_in costs ~190 ms of host
    # dispatch on the tunneled backend
    step_keys = list(jax.random.split(rng, n_steps))
    for i in range(n_steps):
        state, info = step(state, batch, step_keys[i])
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: loss={float(info['loss']):.4f} "
                  f"recall={float(info['recall_coarse']):.3f} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)

    variables = {"params": state.params, "buffers": state.buffers}
    ir_bb, succ_bb = evaluate(variables, "after training", mode="backbone")
    ir1, succ1 = evaluate(variables, "after training", mode="ddim")
    print(f"RESULT: ddim IR {ir0:.3f} -> {ir1:.3f} (success {succ0:.2f} -> {succ1:.2f}); "
          f"backbone IR {ir_bb:.3f} (success {succ_bb:.2f})")
    assert succ_bb >= 0.75, "overfit failed: single-pass registration failed"
    assert succ1 >= 0.75, "overfit failed: diffusion registration failed"
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
