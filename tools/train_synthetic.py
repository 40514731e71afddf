"""Train a real (small-but-full) model on synthetic pairs at scale.

The framework's accuracy evidence beyond the 8-pair overfit: train on a
POOL of synthetic pairs (fresh geometry per pool entry) with the
warp-active training config and the bf16 fast path, then evaluate
registration success on HELD-OUT pairs through the full DDIM + RANSAC
path. Saves an orbax checkpoint + a metrics JSON next to it.

Run: python tools/train_synthetic.py [minutes] [batch_size] [out_dir]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tunnel-down escape hatch: the axon backend initializes FIRST on this
# jaxlib and blocks forever if the tunnel is dead; the config override is
# the only working CPU force (ROADMAP "Known environment quirks")
if os.environ.get("DIFFREG_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "snapshot/train-synthetic"

    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))

    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine import (LossConfig, OptimConfig, create_train_state,
                                    make_train_step)
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.eval import ransac_pose
    from diffreg_tpu.geometry import rotation_error_deg
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.select import extract_correspondences

    # small-but-full model (same shrink as the overfit check), warp ACTIVE
    base = preset_3dmatch(sample_steps=10, train=True)
    matching = dataclasses.replace(base.coarse_matching, feature_dim=96)
    transformer = dataclasses.replace(
        base.coarse_transformer, feature_dim=96, n_head=4,
        feature_matching=matching, flash_attention=False,
        compute_dtype="bfloat16")
    kpfcn = dataclasses.replace(base.kpfcn, first_feats_dim=64,
                                coarse_feature_dim=96, fine_feature_dim=32,
                                first_subsampling_dl=0.06,
                                compute_dtype="bfloat16")
    cfg = dataclasses.replace(base, kpfcn=kpfcn, coarse_transformer=transformer,
                              coarse_matching=matching)
    model = DiffusionMatchingModel(cfg)

    # training pool: distinct synthetic scenes (the host has one core, so
    # batches are pre-built once and cycled)
    n_pool = int(os.environ.get("DIFFREG_POOL", "48"))
    print(f"building {n_pool} pool batches (batch {batch_size})...", flush=True)
    pool = [synthetic_batch(batch_size=batch_size, n_points=512, seed=s)[0]
            for s in range(n_pool)]
    heldout = [synthetic_batch(batch_size=batch_size, n_points=512,
                               seed=10_000 + s)[0] for s in range(2)]

    rng = jax.random.PRNGKey(0)
    ocfg = OptimConfig(optimizer="adam", lr=1e-3)
    state = create_train_state(model, pool[0], rng, ocfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M, pool pairs: {n_pool*batch_size}",
          flush=True)

    step = jax.jit(make_train_step(model, LossConfig(), ocfg))

    from diffreg_tpu.eval.metrics import masked_inlier_ratio

    def _eval(variables, batch):
        out = model.apply(variables, batch, jax.random.PRNGKey(99), mode="ddim")

        def one(conf, mask, s_pcd, t_pcd, rot_gt, trn_gt):
            ir = masked_inlier_ratio(mask, s_pcd, t_pcd, rot_gt, trn_gt[:, 0],
                                     inlier_thr=0.1)
            corrs = extract_correspondences(mask, conf, 512)
            res = ransac_pose(jax.random.PRNGKey(7), s_pcd[corrs.src_idx],
                              t_pcd[corrs.tgt_idx], corrs.valid,
                              distance_threshold=0.05, num_hypotheses=4096)
            return rotation_error_deg(res.rotation[None], rot_gt[None])[0], ir

        return jax.vmap(one)(out["conf_matrix_pred"], out["corr_mask"],
                             out["s_pcd"], out["t_pcd"], batch.rot_gt,
                             batch.trn_gt)

    eval_fn = jax.jit(_eval)

    def heldout_success(variables):
        res = [eval_fn(variables, b) for b in heldout]
        rres = np.concatenate([np.asarray(r[0]) for r in res])
        irs = np.concatenate([np.asarray(r[1]) for r in res])
        return float((rres < 5.0).mean()), rres, float(irs.mean())

    variables = {"params": state.params, "buffers": state.buffers}
    s0, _, ir0 = heldout_success(variables)
    print(f"held-out success@5deg before training: {s0:.2f} IR={ir0:.3f}",
          flush=True)

    os.makedirs(out_dir, exist_ok=True)

    def _dump(partial: bool, i, train_curve, val_curve, extra=None):
        # written at EVERY val so a terminal tunnel stall cannot lose the
        # run; the final write flips partial->False and adds the held-out
        # summary fields the story test thresholds
        payload = {"steps": i, "heldout_success_before": s0,
                   "heldout_ir_before": ir0,
                   "epochs": i / max(epoch_steps, 1),
                   "train_curve": train_curve, "val_curve": val_curve,
                   "pool_pairs": n_pool * batch_size, "partial": partial}
        if val_curve and partial:
            # best-so-far stand-ins so even a partial artifact is scoreable
            payload["heldout_success_after"] = max(s for _, s, _ in val_curve)
            payload["heldout_ir_after"] = max(v for _, _, v in val_curve)
        payload.update(extra or {})
        tmp_path = os.path.join(out_dir, "metrics.json.tmp")
        with open(tmp_path, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp_path, os.path.join(out_dir, "metrics.json"))

    deadline = time.time() + minutes * 60.0
    # materialize step keys to HOST once: indexing a device array per
    # iteration is an eager dispatch (~30-190 ms/call on the tunneled
    # backend, see .claude/skills/verify/SKILL.md)
    keys = np.asarray(jax.random.split(rng, 200_000))
    epoch_steps = n_pool      # one pass over the pool
    eval_every = int(os.environ.get("DIFFREG_EVAL_EVERY", "2000"))
    train_curve = []          # [(step, loss)]
    val_curve = [(0, s0, ir0)]  # [(step, success@5deg, mean IR)]
    i = 0
    t0 = time.time()
    while time.time() < deadline:
        state, info = step(state, pool[i % n_pool], jnp.asarray(keys[i]))
        i += 1
        if i % 200 == 0:
            loss = float(info["loss"])           # readback barrier
            train_curve.append((i, loss))
            print(f"step {i}: loss={loss:.4f} "
                  f"({(time.time()-t0)/i:.2f}s/step)", flush=True)
        if i % eval_every == 0:
            v = {"params": state.params, "buffers": state.buffers}
            s, _, irv = heldout_success(v)
            val_curve.append((i, s, irv))
            print(f"  val @{i}: success={s:.2f} IR={irv:.3f}", flush=True)
            _dump(True, i, train_curve, val_curve)

    variables = {"params": state.params, "buffers": state.buffers}
    s1, rres, ir1 = heldout_success(variables)
    val_curve.append((i, s1, ir1))
    print(f"held-out success@5deg after {i} steps: {s1:.2f} IR={ir1:.3f} "
          f"(RRE {np.round(rres, 1)})", flush=True)

    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    mgr.save(i, variables, {"heldout_success": s1})
    _dump(False, i, train_curve, val_curve,
          extra={"heldout_success_after": s1, "heldout_ir_after": ir1,
                 "heldout_rre_deg": rres.tolist()})
    print("saved", out_dir, flush=True)


if __name__ == "__main__":
    main()
