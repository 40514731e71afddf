"""Train a real (small-but-full) model on synthetic pairs at scale.

The framework's accuracy evidence beyond the 8-pair overfit: train with the
warp-active training config and the bf16 fast path on a STREAMED pool of
synthetic pairs — a background thread keeps replacing pool slots with fresh
scenes, so the run sees thousands of distinct pairs instead of memorizing a
fixed 48-batch pool (the round-3 run did ~1300 epochs over 384 pairs and
plateaued at ~0.5 held-out success; fresh data is the generalization lever).
Model selection happens on a VAL split (seeds 20k+) and the reported
held-out numbers come from a disjoint TEST split (seeds 10k+) through the
full DDIM + RANSAC path. Saves orbax checkpoints (final + best-val) and a
metrics JSON next to them.

Run:      python tools/train_synthetic.py [minutes] [batch_size] [out_dir]
Finalize: python tools/train_synthetic.py finalize [out_dir] [batch_size]
          — recovers the run if the training process was killed: restores the
          best-val checkpoint from disk (saved at EVERY val improvement) and
          re-runs the test-split eval, flipping metrics.json partial->False.
Env: DIFFREG_POOL (pool slots), DIFFREG_FRESH=0 (disable streaming),
     DIFFREG_EVAL_EVERY, DIFFREG_RATE_EST (steps/s estimate for the cosine
     horizon), DIFFREG_PRECISION, DIFFREG_RESUME=1 (restore the best-val
     checkpoint from out_dir and CONTINUE training — a fine-tune leg with a
     fresh optimizer and the usual cosine schedule over the new time budget;
     step numbering and metric curves continue from the prior run so
     checkpoints never collide and the artifact stays one story).
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


def build_model():
    """The small-but-full 3DMatch story model (same shrink as the overfit
    check), warp ACTIVE."""
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch

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
    return DiffusionMatchingModel(cfg)


def make_split_success(model):
    """jitted DDIM+RANSAC eval -> (success@5deg, RREs, mean IR) over batches."""
    from diffreg_tpu.eval import ransac_pose
    from diffreg_tpu.eval.metrics import masked_inlier_ratio
    from diffreg_tpu.geometry import rotation_error_deg
    from diffreg_tpu.ops.select import extract_correspondences

    def _eval(variables, batch):
        out = model.apply(variables, batch, jax.random.PRNGKey(99), mode="ddim")

        def one(conf, mask, s_pcd, t_pcd, rot_gt, trn_gt):
            ir = masked_inlier_ratio(mask, s_pcd, t_pcd, rot_gt, trn_gt[:, 0],
                                     inlier_thr=0.1)
            corrs = extract_correspondences(mask, conf, 512)
            # 16384 covers the low-IR tail per the budget study (ROADMAP):
            # failures past ~8k hypotheses are matcher quality, not RANSAC
            res = ransac_pose(jax.random.PRNGKey(7), s_pcd[corrs.src_idx],
                              t_pcd[corrs.tgt_idx], corrs.valid,
                              distance_threshold=0.05, num_hypotheses=16384)
            return rotation_error_deg(res.rotation[None], rot_gt[None])[0], ir

        return jax.vmap(one)(out["conf_matrix_pred"], out["corr_mask"],
                             out["s_pcd"], out["t_pcd"], batch.rot_gt,
                             batch.trn_gt)

    eval_fn = jax.jit(_eval)

    def split_success(variables, batches):
        res = [eval_fn(variables, b) for b in batches]
        rres = np.concatenate([np.asarray(r[0]) for r in res])
        irs = np.concatenate([np.asarray(r[1]) for r in res])
        return float((rres < 5.0).mean()), rres, float(irs.mean())

    return split_success


def ckpt_save(mgr, step, state, metrics):
    """Best-effort checkpoint save — a step collision or transient orbax
    error must never kill a multi-hour training run."""
    try:
        mgr.save(step, state, metrics)
    except Exception as e:  # noqa: BLE001
        print(f"ckpt save @{step} failed (non-fatal): {e}", flush=True)


def finalize(out_dir, batch_size):
    """Recover a killed run: restore the best-val checkpoint from disk and
    re-run the held-out test eval, flipping metrics.json partial->False."""
    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine.checkpoint import CheckpointManager

    model = build_model()
    heldout = [synthetic_batch(batch_size=batch_size, n_points=512,
                               seed=10_000 + s)[0] for s in range(4)]
    rng = jax.random.PRNGKey(0)
    template = model.init({"params": rng}, heldout[0], rng, mode="train")
    template = {"params": template["params"],
                "buffers": template.get("buffers", {})}
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    step = mgr.best_step("val_success")
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {out_dir}/checkpoints")
    sel = mgr.restore(template, step)
    split_success = make_split_success(model)
    s1, rres, ir1 = split_success(sel, heldout)
    print(f"finalize: best-val ckpt @{step}: test success {s1:.2f} "
          f"IR {ir1:.3f} (RRE {np.round(np.asarray(rres), 1)})", flush=True)
    path = os.path.join(out_dir, "metrics.json")
    with open(path) as f:
        payload = json.load(f)
    payload.update({"partial": False, "heldout_success_after": s1,
                    "heldout_ir_after": ir1,
                    "heldout_rre_deg": np.asarray(rres).tolist(),
                    "selected_step": int(step),
                    "finalized_from_checkpoint": True,
                    "test_pairs": len(heldout) * batch_size,
                    "protocol": "best-val-checkpoint (recovered from disk) "
                                "evaluated on disjoint test split (val seeds "
                                "20k+, test seeds 10k+)"})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)
    print("finalized", path, flush=True)


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "snapshot/train-synthetic"

    from diffreg_tpu.data import synthetic_batch
    from diffreg_tpu.engine import (LossConfig, OptimConfig, create_train_state,
                                    make_train_step)
    from diffreg_tpu.engine.checkpoint import CheckpointManager

    model = build_model()

    # training pool: distinct synthetic scenes. Batches are pre-built (one
    # host core), then a producer thread streams FRESH scenes into the pool
    # round-robin (~0.35 s/batch to build vs ~20 train steps/s, so each slot
    # is reused ~a dozen times before replacement — effectively unbounded
    # data over an hour-long run).
    n_pool = int(os.environ.get("DIFFREG_POOL", "48"))
    print(f"building {n_pool} pool batches (batch {batch_size})...", flush=True)
    pool = [synthetic_batch(batch_size=batch_size, n_points=512, seed=s)[0]
            for s in range(n_pool)]
    # disjoint splits: VAL picks the checkpoint, TEST is only reported
    heldout = [synthetic_batch(batch_size=batch_size, n_points=512,
                               seed=10_000 + s)[0] for s in range(4)]
    n_val = int(os.environ.get("DIFFREG_VAL_BATCHES", "2"))
    val_batches = [synthetic_batch(batch_size=batch_size, n_points=512,
                                   seed=20_000 + s)[0] for s in range(n_val)]

    import queue
    import threading

    stop_producer = threading.Event()
    fresh_q: "queue.Queue" = queue.Queue(maxsize=8)

    def _produce_fresh():
        seed = 1_000_000
        while not stop_producer.is_set():
            b = synthetic_batch(batch_size=batch_size, n_points=512,
                                seed=seed, as_jnp=False)[0]
            seed += 1
            while not stop_producer.is_set():
                try:
                    fresh_q.put(b, timeout=1.0)
                    break
                except queue.Full:
                    continue

    stream_fresh = os.environ.get("DIFFREG_FRESH", "1") != "0"
    if stream_fresh:
        threading.Thread(target=_produce_fresh, daemon=True).start()

    rng = jax.random.PRNGKey(0)
    # cosine decay over the estimated step horizon: the round-3 run's val
    # curve got NOISIER late (0.31-0.63 swings at constant 1e-3), so anneal
    # to 0.1x by the end of the time budget
    rate_est = float(os.environ.get("DIFFREG_RATE_EST", "18"))
    horizon = max(int(minutes * 60.0 * rate_est), 2000)
    ocfg = OptimConfig(optimizer="adam", lr=1e-3, scheduler="warmup_cosine",
                       warmup_steps=300, total_steps=horizon, eta_min=0.1)
    state = create_train_state(model, pool[0], rng, ocfg)

    # DIFFREG_RESUME=1: continue a prior run in this out_dir from its
    # best-val checkpoint. Optimizer moments were not checkpointed (the
    # saved tree is {params, buffers} only), so this is a warm-started
    # fine-tune leg: fresh adam + warmup_cosine over the NEW time budget,
    # which in practice behaves like a restart-anneal.
    start_step = 0
    prev_train_curve, prev_val_curve = [], []
    prev_before = None
    if os.environ.get("DIFFREG_RESUME", "0") == "1":
        mgr0 = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        rstep = mgr0.best_step("val_success")
        if rstep is None:
            rstep = mgr0.latest_step()
        if rstep is not None:
            template = {"params": state.params, "buffers": state.buffers}
            restored = mgr0.restore(template, rstep)
            state = state._replace(params=restored["params"],
                                   buffers=restored["buffers"])
            start_step = int(rstep)
            mpath = os.path.join(out_dir, "metrics.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    prior = json.load(f)
                prev_train_curve = [tuple(x) for x in prior.get("train_curve", [])
                                    if x[0] <= start_step]
                prev_val_curve = [tuple(x) for x in prior.get("val_curve", [])
                                  if x[0] <= start_step]
                prev_before = (prior.get("heldout_success_before"),
                               prior.get("heldout_ir_before"))
            print(f"resumed from best-val checkpoint @{start_step}", flush=True)
        else:
            print("DIFFREG_RESUME=1 but no checkpoint found; fresh run",
                  flush=True)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M, pool pairs: {n_pool*batch_size}",
          flush=True)

    step = jax.jit(make_train_step(model, LossConfig(), ocfg))

    split_success = make_split_success(model)

    variables = {"params": state.params, "buffers": state.buffers}
    s0, _, ir0 = split_success(variables, heldout)
    v0, _, irv0 = split_success(variables, val_batches)
    print(f"held-out(test) success@5deg before training: {s0:.2f} "
          f"IR={ir0:.3f} (val {v0:.2f})", flush=True)
    if prev_before is not None and prev_before[0] is not None:
        # resumed leg: the story's "before" numbers stay the ORIGINAL
        # untrained baseline, not the warm-start point
        s0, ir0 = prev_before

    os.makedirs(out_dir, exist_ok=True)

    def _dump(partial: bool, i, train_curve, val_curve, extra=None):
        # written at EVERY val so a terminal tunnel stall cannot lose the
        # run; the final write flips partial->False and adds the held-out
        # summary fields the story test thresholds
        payload = {"steps": start_step + i, "heldout_success_before": s0,
                   "heldout_ir_before": ir0,
                   "epochs": (start_step + i) / max(epoch_steps, 1),
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

    # open the manager BEFORE the loop: every val improvement is persisted
    # immediately so a killed process (tunnel stall, session death) never
    # loses the best params again (the r4b run lost val-0.94 params that
    # lived only in memory)
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))

    deadline = time.time() + minutes * 60.0
    # materialize step keys to HOST once: indexing a device array per
    # iteration is an eager dispatch (~30-190 ms/call on the tunneled
    # backend, see .claude/skills/verify/SKILL.md)
    keys = np.asarray(jax.random.split(rng, 200_000))
    epoch_steps = n_pool      # one pass over the pool
    eval_every = int(os.environ.get("DIFFREG_EVAL_EVERY", "2000"))
    train_curve = list(prev_train_curve)      # [(step, loss)]
    val_curve = list(prev_val_curve) or [(0, v0, irv0)]
    if start_step and (not val_curve or val_curve[-1][0] < start_step):
        val_curve.append((start_step, v0, irv0))
    best = {"val": v0, "step": start_step,
            "variables": jax.device_get(variables)}
    fresh_used = 0
    slot = 0
    i = 0
    t0 = time.time()
    while time.time() < deadline:
        state, info = step(state, pool[i % n_pool], jnp.asarray(keys[i]))
        i += 1
        # swap ONE fresh scene into the pool per step when the producer has
        # one ready (device placement from the main thread only — the
        # tunneled backend is not trusted with concurrent transfers)
        if stream_fresh:
            try:
                nb = fresh_q.get_nowait()
            except queue.Empty:
                nb = None
            if nb is not None:
                pool[slot] = jax.device_put(nb)
                slot = (slot + 1) % n_pool
                fresh_used += 1
        g = start_step + i
        if i % 200 == 0:
            loss = float(info["loss"])           # readback barrier
            train_curve.append((g, loss))
            print(f"step {g}: loss={loss:.4f} "
                  f"({(time.time()-t0)/i:.2f}s/step, "
                  f"{fresh_used} fresh batches)", flush=True)
        if i % eval_every == 0:
            v = {"params": state.params, "buffers": state.buffers}
            s, _, irv = split_success(v, val_batches)
            val_curve.append((g, s, irv))
            if s >= best["val"]:
                best = {"val": s, "step": g, "variables": jax.device_get(v)}
                ckpt_save(mgr, g, best["variables"], {"val_success": s})
            print(f"  val @{g}: success={s:.2f} IR={irv:.3f} "
                  f"(best {best['val']:.2f} @{best['step']})", flush=True)
            _dump(True, i, train_curve, val_curve,
                  extra={"fresh_batches": fresh_used,
                         "selected_step": best["step"]})

    stop_producer.set()
    variables = {"params": state.params, "buffers": state.buffers}
    s_fin, rres_fin, ir_fin = split_success(variables, heldout)
    v_fin, _, irv_fin = split_success(variables, val_batches)
    val_curve.append((start_step + i, v_fin, irv_fin))
    if v_fin >= best["val"]:
        best = {"val": v_fin, "step": start_step + i,
                "variables": jax.device_get(variables)}
        ckpt_save(mgr, start_step + i, best["variables"],
                  {"val_success": v_fin})
    # the REPORTED held-out numbers come from the val-selected checkpoint,
    # evaluated on the disjoint test split (standard selection protocol)
    sel = jax.device_put(best["variables"])
    s1, rres, ir1 = split_success(sel, heldout)
    print(f"final params: test success {s_fin:.2f} IR {ir_fin:.3f}; "
          f"val-selected @{best['step']}: test success {s1:.2f} IR {ir1:.3f} "
          f"(RRE {np.round(rres, 1)})", flush=True)

    ckpt_save(mgr, start_step + i + 1, jax.device_get(variables),
              {"heldout_success": s_fin})
    _dump(False, i, train_curve, val_curve,
          extra={"heldout_success_after": s1, "heldout_ir_after": ir1,
                 "heldout_rre_deg": rres.tolist(),
                 "final_success": s_fin, "final_ir": ir_fin,
                 "selected_step": best["step"], "fresh_batches": fresh_used,
                 "test_pairs": len(heldout) * batch_size,
                 "protocol": "best-val-checkpoint evaluated on disjoint "
                             "test split (val seeds 20k+, test seeds 10k+)"})
    print("saved", out_dir, flush=True)


if __name__ == "__main__":
    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))
    if len(sys.argv) > 1 and sys.argv[1] == "finalize":
        finalize(sys.argv[2] if len(sys.argv) > 2 else
                 "snapshot/train-synthetic",
                 int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    else:
        main()
