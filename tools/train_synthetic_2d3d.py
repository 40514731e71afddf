"""2D-3D branch training story: image<->cloud pairs at scale, RR evidence.

The 3DMatch story proves the rigid branch trains, the 4DMatch story the
deformable one; this is the 2D-3D twin through the full MATR2D3D-equivalent
path (reference Diff-Reg-2d3d trainval.py: vision3d EpochBasedTrainer +
OverallLoss = coarse circle + gt_hat focal + fine circle, loss.py:226-238).
Trains a small-but-full DiffReg2D3D on STREAMED synthetic image<->cloud
scenes (with overlap-ratio + fine pixel<->point GT from the real collate
helpers), and reports the reference eval protocol's metrics — IR at the
0.05 m acceptance radius, FMR, and RR (camera-space RMSE < 0.1 m via
PnP-RANSAC, eval.py:29-339) — on a held-out TEST split with best-val
selection on a disjoint VAL split.

Run:      python tools/train_synthetic_2d3d.py [minutes] [batch_size] [out_dir]
Finalize: python tools/train_synthetic_2d3d.py finalize [out_dir] [batch_size]
          — recovers a killed run from the best-val checkpoint on disk.
Env: DIFFREG_POOL, DIFFREG_FRESH=0, DIFFREG_EVAL_EVERY, DIFFREG_RATE_EST,
     DIFFREG_VAL_BATCHES, DIFFREG_PRECISION, DIFFREG_FORCE_CPU.
"""
from __future__ import annotations

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

IMG_HW = tuple(int(x) for x in
               os.environ.get("DIFFREG_2D3D_HW", "112,154").split(","))
# stride-14 coarse grid at the default: 8x11 = 88 patches
N_POINTS = int(os.environ.get("DIFFREG_2D3D_POINTS", "1024"))
SAMPLE_STEPS = int(os.environ.get("DIFFREG_2D3D_STEPS", "10"))


def build_model():
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig

    cfg = Pipeline2D3DConfig(
        img_out_dim=64, img_base_dim=32,
        pcd_backbone=PointBackboneConfig(output_dim=64, init_dim=32,
                                         init_radius=0.15, init_sigma=0.12),
        hidden_dim=128, output_dim=128, num_heads=4,
        matching=MatchingConfig(feature_dim=128),
        coarse_stride=14, sample_steps=SAMPLE_STEPS)
    return DiffReg2D3D(cfg)


def make_batch(batch_size, seed, as_jnp=True):
    from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch

    return synthetic_2d3d_batch(
        batch_size=batch_size, img_hw=IMG_HW, n_points=N_POINTS, seed=seed,
        coarse_stride=14, with_full_gt=True, n_overlap=256, n_fine_gt=128,
        as_jnp=as_jnp)


def make_split_eval(model, variables):
    """Reference-protocol eval over batches -> (RR, IR, FMR) via the
    TwoDThreeDTester (DDIM + fine matching + device PnP). Returns the tester
    so callers can swap ``tester.variables`` without recompiling."""
    from diffreg_tpu.engine.tester2d3d import Test2D3DConfig, TwoDThreeDTester

    tester = TwoDThreeDTester(
        model, variables,
        Test2D3DConfig(pnp_hypotheses=4096, max_fine_corr=512))

    def split_eval(variables, batches):
        tester.variables = variables

        def make_iter():
            for j, b in enumerate(batches):
                yield b, [f"s{j}"] * b.image.shape[0]

        s = tester.test(make_iter)
        return float(s["RR"]), float(s["IR"]), float(s["FMR"])

    return split_eval


def ckpt_save(mgr, step, state, metrics):
    try:
        mgr.save(step, state, metrics)
    except Exception as e:  # noqa: BLE001
        print(f"ckpt save @{step} failed (non-fatal): {e}", flush=True)


def finalize(out_dir, batch_size):
    from diffreg_tpu.engine.checkpoint import CheckpointManager

    model = build_model()
    heldout = [make_batch(batch_size, 10_000 + s) for s in range(4)]
    rng = jax.random.PRNGKey(0)
    template = model.init({"params": rng}, heldout[0], rng, mode="train")
    template = {"params": template["params"],
                "buffers": template.get("buffers", {})}
    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    step = mgr.best_step("val_rr")
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {out_dir}/checkpoints")
    sel = mgr.restore(template, step)
    split_eval = make_split_eval(model, sel)
    rr1, ir1, fmr1 = split_eval(sel, heldout)
    print(f"finalize: best-val ckpt @{step}: test RR {rr1:.3f} IR {ir1:.3f} "
          f"FMR {fmr1:.3f}", flush=True)
    path = os.path.join(out_dir, "metrics.json")
    with open(path) as f:
        payload = json.load(f)
    payload.update({"partial": False, "heldout_rr_after": rr1,
                    "heldout_ir_after": ir1, "heldout_fmr_after": fmr1,
                    "selected_step": int(step),
                    "finalized_from_checkpoint": True,
                    "test_pairs": len(heldout) * batch_size,
                    "protocol": "best-val(RR,IR)-checkpoint (recovered from "
                                "disk) evaluated on disjoint test split "
                                "(val seeds 20k+, test seeds 10k+)"})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)
    print("finalized", path, flush=True)


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "snapshot/train-synthetic-2d3d"

    from diffreg_tpu.engine import LossConfig, OptimConfig
    from diffreg_tpu.engine.checkpoint import CheckpointManager
    from diffreg_tpu.engine.losses2d3d import CircleLossConfig, FineLossConfig
    from diffreg_tpu.engine.train2d3d import (create_train_state_2d3d,
                                              make_train_step_2d3d)

    model = build_model()

    n_pool = int(os.environ.get("DIFFREG_POOL", "24"))
    print(f"building {n_pool} pool batches (batch {batch_size})...", flush=True)
    pool = [make_batch(batch_size, s) for s in range(n_pool)]
    heldout = [make_batch(batch_size, 10_000 + s) for s in range(4)]
    n_val = int(os.environ.get("DIFFREG_VAL_BATCHES", "2"))
    val_batches = [make_batch(batch_size, 20_000 + s) for s in range(n_val)]

    import queue
    import threading

    stop_producer = threading.Event()
    fresh_q: "queue.Queue" = queue.Queue(maxsize=4)

    def _produce_fresh():
        seed = 1_000_000
        while not stop_producer.is_set():
            b = make_batch(batch_size, seed, as_jnp=False)
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
    rate_est = float(os.environ.get("DIFFREG_RATE_EST", "3"))
    horizon = max(int(minutes * 60.0 * rate_est), 1000)
    ocfg = OptimConfig(optimizer="adam", lr=5e-4, scheduler="warmup_cosine",
                       warmup_steps=200, total_steps=horizon, eta_min=0.1)
    state = create_train_state_2d3d(model, pool[0], rng, ocfg)

    # DIFFREG_RESUME=1: continue a prior run in this out_dir from its
    # best-val checkpoint — warm-started fine-tune leg (optimizer moments
    # were not checkpointed), same scheme as tools/train_synthetic.py
    start_step = 0
    prev_train_curve, prev_val_curve = [], []
    prev_before = None
    if os.environ.get("DIFFREG_RESUME", "0") == "1":
        mgr0 = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        rstep = mgr0.best_step("val_rr")
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
                prev_before = (prior.get("heldout_rr_before"),
                               prior.get("heldout_ir_before"),
                               prior.get("heldout_fmr_before"))
            print(f"resumed from best-val checkpoint @{start_step}", flush=True)
        else:
            print("DIFFREG_RESUME=1 but no checkpoint found; fresh run",
                  flush=True)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M, pool pairs: {n_pool*batch_size}",
          flush=True)

    step = jax.jit(make_train_step_2d3d(model, CircleLossConfig(),
                                        LossConfig(), ocfg,
                                        fine_cfg=FineLossConfig()))

    variables = {"params": state.params, "buffers": state.buffers}
    split_eval = make_split_eval(model, variables)
    rr0, ir0, fmr0 = split_eval(variables, heldout)
    vrr0, vir0, _ = split_eval(variables, val_batches)
    print(f"held-out(test) before: RR={rr0:.3f} IR={ir0:.3f} FMR={fmr0:.3f} "
          f"(val RR={vrr0:.3f} IR={vir0:.3f})", flush=True)
    if prev_before is not None and prev_before[0] is not None:
        # resumed leg: keep the ORIGINAL untrained baseline as "before"
        rr0, ir0, fmr0 = prev_before

    os.makedirs(out_dir, exist_ok=True)
    epoch_steps = n_pool

    def _dump(partial: bool, i, train_curve, val_curve, extra=None):
        payload = {"steps": start_step + i, "heldout_rr_before": rr0,
                   "heldout_ir_before": ir0, "heldout_fmr_before": fmr0,
                   "epochs": (start_step + i) / max(epoch_steps, 1),
                   "train_curve": train_curve, "val_curve": val_curve,
                   "pool_pairs": n_pool * batch_size, "partial": partial,
                   "variant": "2d3d"}
        if val_curve and partial:
            payload["heldout_rr_after"] = max(r for _, r, _ in val_curve)
            payload["heldout_ir_after"] = max(v for _, _, v in val_curve)
        payload.update(extra or {})
        tmp_path = os.path.join(out_dir, "metrics.json.tmp")
        with open(tmp_path, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp_path, os.path.join(out_dir, "metrics.json"))

    mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))

    deadline = time.time() + minutes * 60.0
    keys = np.asarray(jax.random.split(rng, 200_000))
    eval_every = int(os.environ.get("DIFFREG_EVAL_EVERY", "500"))
    train_curve = list(prev_train_curve)   # [(step, loss)]
    val_curve = list(prev_val_curve) or [(0, vrr0, vir0)]
    if start_step and (not val_curve or val_curve[-1][0] < start_step):
        val_curve.append((start_step, vrr0, vir0))
    best = {"key": (vrr0, vir0), "step": start_step,
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
        if i % 100 == 0:
            loss = float(info["loss"])           # readback barrier
            train_curve.append((g, loss))
            print(f"step {g}: loss={loss:.4f} "
                  f"({(time.time()-t0)/i:.2f}s/step, "
                  f"{fresh_used} fresh batches)", flush=True)
        if i % eval_every == 0:
            v = {"params": state.params, "buffers": state.buffers}
            vrr, vir, _ = split_eval(v, val_batches)
            val_curve.append((g, vrr, vir))
            if (vrr, vir) >= best["key"]:
                best = {"key": (vrr, vir), "step": g,
                        "variables": jax.device_get(v)}
                ckpt_save(mgr, g, best["variables"], {"val_rr": vrr})
            print(f"  val @{g}: RR={vrr:.3f} IR={vir:.3f} "
                  f"(best {best['key']} @{best['step']})", flush=True)
            _dump(True, i, train_curve, val_curve,
                  extra={"fresh_batches": fresh_used,
                         "selected_step": best["step"]})

    stop_producer.set()
    variables = {"params": state.params, "buffers": state.buffers}
    vrr_fin, vir_fin, _ = split_eval(variables, val_batches)
    val_curve.append((start_step + i, vrr_fin, vir_fin))
    if (vrr_fin, vir_fin) >= best["key"]:
        best = {"key": (vrr_fin, vir_fin), "step": start_step + i,
                "variables": jax.device_get(variables)}
        ckpt_save(mgr, start_step + i, best["variables"],
                  {"val_rr": vrr_fin})
    sel = jax.device_put(best["variables"])
    rr1, ir1, fmr1 = split_eval(sel, heldout)
    print(f"val-selected @{best['step']}: test RR {rr1:.3f} IR {ir1:.3f} "
          f"FMR {fmr1:.3f}", flush=True)

    ckpt_save(mgr, start_step + i + 1, jax.device_get(variables),
              {"final": 1.0})
    _dump(False, i, train_curve, val_curve,
          extra={"heldout_rr_after": rr1, "heldout_ir_after": ir1,
                 "heldout_fmr_after": fmr1,
                 "selected_step": best["step"], "fresh_batches": fresh_used,
                 "test_pairs": len(heldout) * batch_size,
                 "protocol": "best-val(RR,IR)-checkpoint evaluated on "
                             "disjoint test split (val seeds 20k+, test "
                             "seeds 10k+)"})
    print("saved", out_dir, flush=True)


if __name__ == "__main__":
    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))
    if len(sys.argv) > 1 and sys.argv[1] == "finalize":
        finalize(sys.argv[2] if len(sys.argv) > 2 else
                 "snapshot/train-synthetic-2d3d",
                 int(sys.argv[3]) if len(sys.argv) > 3 else 4)
    else:
        main()
