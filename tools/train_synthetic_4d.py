"""4DMatch-branch training story: deformable pairs at scale, NFMR evidence.

The 3DMatch story (tools/train_synthetic.py) proves the rigid branch trains
and generalizes; this is its deformable twin through the 4DMatch deltas
(gaussian+sigmoid noising, stochastic DDIM, sigmoid prediction head with
thr-mutual extraction, masked-length procrustes — SURVEY.md §2.1 "4DMatch
branch deltas"). Trains a small-but-full 4d model on STREAMED synthetic
deformable scenes and reports the reference tester's metrics — IR at the
4DMatch 0.04 m threshold and NFMR via anchor motion blending
(lib/tester.py:127-210) — on a held-out TEST split with best-val selection
on a disjoint VAL split.

Run:      python tools/train_synthetic_4d.py [minutes] [batch_size] [out_dir]
Finalize: python tools/train_synthetic_4d.py finalize [out_dir] [batch_size]
          — recovers a killed run from the best-val checkpoint on disk.
Env: DIFFREG_POOL, DIFFREG_FRESH=0, DIFFREG_EVAL_EVERY, DIFFREG_RATE_EST,
     DIFFREG_VAL_BATCHES, DIFFREG_PRECISION, DIFFREG_FORCE_CPU.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIFFREG_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

N_POINTS = 512
M_METRIC = 512   # padded metric-point capacity (all raw src points)

# Scene scale: the 4DMatch protocol thresholds are ABSOLUTE (IR/recall 0.04 m,
# lib/tester.py:241; anchor blend radius 0.1 m, lib/tester.py:127) while the
# reference trains at first_subsampling_dl=0.01 (configs/test/4dmatch.yaml:9),
# i.e. coarse voxel = 0.04 = one threshold. The default synthetic scene
# (span ~1.8, dl 0.06 -> coarse voxel 0.24) is 6x coarser, which caps the
# ORACLE (perfect GT matcher) at IR 0.21 / NFMR 0.15 — the round-4 run's
# "plateau" was the resolution ceiling, not the model. Scaling the scene by
# 1/6 and using the preset's dl=0.01 restores the reference geometry ratio:
# oracle IR 1.00 / NFMR 0.86 with deformation at 2.5x the recall threshold.
SCENE_SCALE = 1.0 / 6.0
FLOW_AMP = 0.60   # pre-scale; 0.1 post-scale = 2.5x the 0.04 recall threshold


def deformable_batch(batch_size, seed, spec=None, cfg=None, as_jnp=True):
    """Synthetic deformable pairs + their metric points (raw src + GT flow),
    the inputs the 4DMatch NFMR protocol needs."""
    from diffreg_tpu.data import batch_from_samples, make_pair
    from diffreg_tpu.data.pyramid import PyramidConfig, build_pair_pyramid
    from diffreg_tpu.data.synthetic import tiny_spec

    rng = np.random.RandomState(seed)
    cfg = cfg or PyramidConfig(first_subsampling_dl=0.06 * SCENE_SCALE,
                               coarse_match_radius=0.15 * SCENE_SCALE)
    spec = spec or tiny_spec(N_POINTS)
    samples, mp, mf, mv = [], [], [], []
    for _ in range(batch_size):
        src, tgt, rot, trn, flow = make_pair(rng, N_POINTS, deformable=True,
                                             flow_amp=FLOW_AMP,
                                             scale=SCENE_SCALE)
        samples.append(build_pair_pyramid(src, tgt, rot, trn, cfg, spec,
                                          scene_flow=flow))
        n = min(len(src), M_METRIC)
        pcd = np.zeros((M_METRIC, 3), np.float32)
        fl = np.zeros((M_METRIC, 3), np.float32)
        va = np.zeros(M_METRIC, bool)
        pcd[:n], fl[:n], va[:n] = src[:n], flow[:n], True
        mp.append(pcd), mf.append(fl), mv.append(va)
    batch = batch_from_samples(samples, as_jnp=as_jnp)
    stack = jnp.stack if as_jnp else np.stack
    return batch, (stack([jnp.asarray(x) if as_jnp else x for x in mp]),
                   stack([jnp.asarray(x) if as_jnp else x for x in mf]),
                   stack([jnp.asarray(x) if as_jnp else x for x in mv]))


def build_model():
    """Small-but-full 4d model (same shrink as the 3d story); warp ACTIVE by
    construction — preset_4dmatch keeps max_condition_num=40 in eval."""
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_4dmatch

    base = preset_4dmatch(sample_steps=10)
    matching = dataclasses.replace(base.coarse_matching, feature_dim=96)
    # keep the preset's reference-geometry voxels (first_subsampling_dl 0.01,
    # VolPE voxel 0.04) — the scenes are generated at SCENE_SCALE to match
    transformer = dataclasses.replace(
        base.coarse_transformer, feature_dim=96, n_head=4,
        feature_matching=matching, flash_attention=False,
        compute_dtype="bfloat16")
    kpfcn = dataclasses.replace(base.kpfcn, first_feats_dim=64,
                                coarse_feature_dim=96, fine_feature_dim=32,
                                compute_dtype="bfloat16")
    cfg = dataclasses.replace(base, kpfcn=kpfcn, coarse_transformer=transformer,
                              coarse_matching=matching)
    return DiffusionMatchingModel(cfg)


def make_split_metrics(model):
    """jitted 4DMatch tester protocol -> (mean IR@0.04, mean NFMR)."""
    from diffreg_tpu.eval.metrics import inlier_ratio, nfmr
    from diffreg_tpu.ops.select import (extract_correspondences,
                                        thresholded_mutual_argmax_mask)

    match_thr = 0.55      # reference CLI --thr (README.md:25)
    max_corr = 256

    def _eval(variables, batch, metric_pcd, metric_flow, metric_valid):
        """4DMatch tester protocol, one jit: sigmoid conf -> thr-mutual
        extraction -> IR@0.04 (flow-corrected) + NFMR via anchor blending."""
        out = model.apply(variables, batch, jax.random.PRNGKey(99), mode="ddim")
        conf = out["conf_matrix_pred"]
        mask = thresholded_mutual_argmax_mask(conf, match_thr, mutual=True)
        mask = mask & batch.src_mask[:, :, None] & batch.tgt_mask[:, None, :]

        def one(conf_i, mask_i, s_pcd, t_pcd, flow, rot_gt, trn_gt,
                mpcd, mflow, mvalid):
            corrs = extract_correspondences(mask_i, conf_i, max_corr)
            src_c, tgt_c = s_pcd[corrs.src_idx], t_pcd[corrs.tgt_idx]
            ir = inlier_ratio(src_c, tgt_c, corrs.valid, rot_gt, trn_gt[:, 0],
                              inlier_thr=0.04,
                              coarse_flow_corr=flow[corrs.src_idx])
            v = nfmr(mpcd, mflow, rot_gt, trn_gt[:, 0],
                     src_c, tgt_c, corrs.valid, mvalid, recall_thr=0.04)
            return ir, v

        return jax.vmap(one)(conf, mask, out["s_pcd"], out["t_pcd"],
                             batch.coarse_flow, batch.rot_gt, batch.trn_gt,
                             metric_pcd, metric_flow, metric_valid)

    eval_fn = jax.jit(_eval)

    def split_metrics(variables, batches):
        irs, nf = [], []
        for b, (mp, mf, mv) in batches:
            ir, v = eval_fn(variables, b, mp, mf, mv)
            irs.append(np.asarray(ir)), nf.append(np.asarray(v))
        return float(np.concatenate(irs).mean()), float(np.concatenate(nf).mean())

    return split_metrics


def ckpt_save(mgr, step, state, metrics):
    """Best-effort checkpoint save — a step collision or transient orbax
    error must never kill a multi-hour training run."""
    try:
        mgr.save(step, state, metrics)
    except Exception as e:  # noqa: BLE001
        print(f"ckpt save @{step} failed (non-fatal): {e}", flush=True)


def finalize(out_dir, batch_size):
    """Recover a killed run: restore the best-val(NFMR) checkpoint from disk
    and re-run the held-out test eval, flipping metrics.json partial->False."""
    from diffreg_tpu.engine.checkpoint import CheckpointManager

    model = build_model()
    heldout = [deformable_batch(batch_size, seed=10_000 + s) for s in range(4)]
    rng = jax.random.PRNGKey(0)
    template = model.init({"params": rng}, heldout[0][0], rng, mode="train")
    template = {"params": template["params"],
                "buffers": template.get("buffers", {})}
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    step = mgr.best_step("val_nfmr")
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {out_dir}/checkpoints")
    sel = mgr.restore(template, step)
    split_metrics = make_split_metrics(model)
    ir1, nfmr1 = split_metrics(sel, heldout)
    print(f"finalize: best-val ckpt @{step}: test IR {ir1:.3f} "
          f"NFMR {nfmr1:.3f}", flush=True)
    path = os.path.join(out_dir, "metrics.json")
    with open(path) as f:
        payload = json.load(f)
    payload.update({"partial": False, "heldout_ir_after": ir1,
                    "heldout_nfmr_after": nfmr1, "selected_step": int(step),
                    "finalized_from_checkpoint": True,
                    "test_pairs": len(heldout) * batch_size,
                    "protocol": "best-val(NFMR)-checkpoint (recovered from "
                                "disk) evaluated on disjoint test split (val "
                                "seeds 20k+, test seeds 10k+)"})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)
    print("finalized", path, flush=True)


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "snapshot/train-synthetic-4d"

    from diffreg_tpu.engine import (LossConfig, OptimConfig, create_train_state,
                                    make_train_step)
    from diffreg_tpu.engine.checkpoint import CheckpointManager

    model = build_model()

    n_pool = int(os.environ.get("DIFFREG_POOL", "48"))
    print(f"building {n_pool} pool batches (batch {batch_size})...", flush=True)
    pool = [deformable_batch(batch_size, seed=s)[0] for s in range(n_pool)]
    heldout = [deformable_batch(batch_size, seed=10_000 + s) for s in range(4)]
    n_val = int(os.environ.get("DIFFREG_VAL_BATCHES", "4"))
    val_batches = [deformable_batch(batch_size, seed=20_000 + s)
                   for s in range(n_val)]

    import queue
    import threading

    stop_producer = threading.Event()
    fresh_q: "queue.Queue" = queue.Queue(maxsize=8)

    def _produce_fresh():
        seed = 1_000_000
        while not stop_producer.is_set():
            b = deformable_batch(batch_size, seed=seed, as_jnp=False)[0]
            seed += 1
            while not stop_producer.is_set():
                try:
                    fresh_q.put(b, timeout=1.0)
                    break
                except queue.Full:
                    continue

    if os.environ.get("DIFFREG_FRESH", "1") != "0":
        threading.Thread(target=_produce_fresh, daemon=True).start()
        stream_fresh = True
    else:
        stream_fresh = False

    rng = jax.random.PRNGKey(0)
    rate_est = float(os.environ.get("DIFFREG_RATE_EST", "12"))
    horizon = max(int(minutes * 60.0 * rate_est), 2000)
    # reference 4dmatch training adds the gated motion L1 (motion_weight 0.1,
    # configs/train/4dmatch.yaml:62)
    lcfg = LossConfig(dataset="4dmatch", motion_weight=0.1)
    ocfg = OptimConfig(optimizer="adam", lr=1e-3, scheduler="warmup_cosine",
                       warmup_steps=300, total_steps=horizon, eta_min=0.1)
    state = create_train_state(model, pool[0], rng, ocfg)

    # DIFFREG_RESUME=1: continue a prior run in this out_dir from its
    # best-val(NFMR) checkpoint — warm-started fine-tune leg (optimizer
    # moments were not checkpointed), same scheme as tools/train_synthetic.py
    start_step = 0
    prev_train_curve, prev_val_curve = [], []
    prev_before = None
    if os.environ.get("DIFFREG_RESUME", "0") == "1":
        mgr0 = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        rstep = mgr0.best_step("val_nfmr")
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
                prev_before = (prior.get("heldout_ir_before"),
                               prior.get("heldout_nfmr_before"))
            print(f"resumed from best-val checkpoint @{start_step}", flush=True)
        else:
            print("DIFFREG_RESUME=1 but no checkpoint found; fresh run",
                  flush=True)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M, pool pairs: {n_pool*batch_size}",
          flush=True)

    step = jax.jit(make_train_step(model, lcfg, ocfg))

    split_metrics = make_split_metrics(model)

    variables = {"params": state.params, "buffers": state.buffers}
    ir0, nfmr0 = split_metrics(variables, heldout)
    vir0, vnf0 = split_metrics(variables, val_batches)
    print(f"held-out(test) before: IR={ir0:.3f} NFMR={nfmr0:.3f} "
          f"(val IR={vir0:.3f} NFMR={vnf0:.3f})", flush=True)
    if prev_before is not None and prev_before[0] is not None:
        # resumed leg: keep the ORIGINAL untrained baseline as "before"
        ir0, nfmr0 = prev_before

    os.makedirs(out_dir, exist_ok=True)
    epoch_steps = n_pool

    def _dump(partial, i, train_curve, val_curve, extra=None):
        payload = {"steps": start_step + i, "heldout_ir_before": ir0,
                   "heldout_nfmr_before": nfmr0,
                   "epochs": (start_step + i) / max(epoch_steps, 1),
                   "train_curve": train_curve, "val_curve": val_curve,
                   "pool_pairs": n_pool * batch_size, "partial": partial,
                   "variant": "4dmatch"}
        if val_curve and partial:
            payload["heldout_nfmr_after"] = max(v for _, _, v in val_curve)
            payload["heldout_ir_after"] = max(x for _, x, _ in val_curve)
        payload.update(extra or {})
        tmp = os.path.join(out_dir, "metrics.json.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, os.path.join(out_dir, "metrics.json"))

    # open the manager BEFORE the loop: every val improvement is persisted
    # immediately so a killed process never loses the best params
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))

    deadline = time.time() + minutes * 60.0
    keys = np.asarray(jax.random.split(rng, 200_000))
    eval_every = int(os.environ.get("DIFFREG_EVAL_EVERY", "2000"))
    train_curve = list(prev_train_curve)   # [(step, loss)]
    val_curve = list(prev_val_curve) or [(0, vir0, vnf0)]
    if start_step and (not val_curve or val_curve[-1][0] < start_step):
        val_curve.append((start_step, vir0, vnf0))
    best = {"val": vnf0, "step": start_step,
            "variables": jax.device_get(variables)}
    fresh_used = 0
    slot = 0
    i = 0
    t0 = time.time()
    while time.time() < deadline:
        state, info = step(state, pool[i % n_pool], jnp.asarray(keys[i]))
        i += 1
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
            loss = float(info["loss"])
            train_curve.append((g, loss))
            print(f"step {g}: loss={loss:.4f} ({(time.time()-t0)/i:.2f}s/step,"
                  f" {fresh_used} fresh batches)", flush=True)
        if i % eval_every == 0:
            v = {"params": state.params, "buffers": state.buffers}
            vir, vnf = split_metrics(v, val_batches)
            val_curve.append((g, vir, vnf))
            if vnf >= best["val"]:
                best = {"val": vnf, "step": g, "variables": jax.device_get(v)}
                ckpt_save(mgr, g, best["variables"], {"val_nfmr": vnf})
            print(f"  val @{g}: IR={vir:.3f} NFMR={vnf:.3f} "
                  f"(best {best['val']:.3f} @{best['step']})", flush=True)
            _dump(True, i, train_curve, val_curve,
                  extra={"fresh_batches": fresh_used,
                         "selected_step": best["step"]})

    stop_producer.set()
    variables = {"params": state.params, "buffers": state.buffers}
    ir_fin, nfmr_fin = split_metrics(variables, heldout)
    vir_fin, vnf_fin = split_metrics(variables, val_batches)
    val_curve.append((start_step + i, vir_fin, vnf_fin))
    if vnf_fin >= best["val"]:
        best = {"val": vnf_fin, "step": start_step + i,
                "variables": jax.device_get(variables)}
        ckpt_save(mgr, start_step + i, best["variables"],
                  {"val_nfmr": vnf_fin})
    sel = jax.device_put(best["variables"])
    ir1, nfmr1 = split_metrics(sel, heldout)
    print(f"final params: test IR {ir_fin:.3f} NFMR {nfmr_fin:.3f}; "
          f"val-selected @{best['step']}: test IR {ir1:.3f} NFMR {nfmr1:.3f}",
          flush=True)

    ckpt_save(mgr, start_step + i + 1, jax.device_get(variables),
              {"heldout_nfmr": nfmr_fin})
    _dump(False, i, train_curve, val_curve,
          extra={"heldout_ir_after": ir1, "heldout_nfmr_after": nfmr1,
                 "final_ir": ir_fin, "final_nfmr": nfmr_fin,
                 "selected_step": best["step"], "fresh_batches": fresh_used,
                 "test_pairs": len(heldout) * batch_size,
                 "protocol": "best-val(NFMR)-checkpoint evaluated on disjoint "
                             "test split (val seeds 20k+, test seeds 10k+)"})
    print("saved", out_dir, flush=True)


if __name__ == "__main__":
    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))
    if len(sys.argv) > 1 and sys.argv[1] == "finalize":
        finalize(sys.argv[2] if len(sys.argv) > 2 else
                 "snapshot/train-synthetic-4d",
                 int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    else:
        main()
