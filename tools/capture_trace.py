"""Capture a jax.profiler trace + step timings for perf-regression tracking.

Runs N timed DDIM eval steps (and optionally train steps) of the flagship
preset, writes an xprof trace under --out/trace/ and a machine-readable
steps.json (per-step wall seconds with device-readback barriers), so
regressions between rounds can be diffed both at the timeline level and as
one number. CI usage:

    python tools/capture_trace.py --steps 3 --batch 8 --out /tmp/trace_r3

On the tunneled axon backend every timing uses a device->host readback
(block_until_ready does not block there, ROADMAP.md); all RNG keys are
pre-derived on host.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3, help="timed iterations")
    ap.add_argument("--sample-steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--train", action="store_true", help="also trace a train step")
    ap.add_argument("--warp-active", action="store_true",
                    help="condition gate 40 (every DDIM step pays the warp)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out", default="/tmp/diffreg_trace")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # the env var does NOT override the axon plugin; only the config does
        jax.config.update("jax_platforms", "cpu")

    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))

    import jax.numpy as jnp
    import numpy as np

    from diffreg_tpu.data import make_pair, synthetic_batch
    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch

    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal = np.random.RandomState(0)
    spec = calibrate_spec([make_pair(cal, args.n_points)[:2] for _ in range(2)],
                          pcfg, k_cap=40)
    batch, _, _ = synthetic_batch(batch_size=args.batch, n_points=args.n_points,
                                  seed=0, spec=spec, cfg=pcfg)

    cfg = preset_3dmatch(sample_steps=args.sample_steps)
    tf = dataclasses.replace(cfg.coarse_transformer, flash_attention=False)
    if args.warp_active:
        proc = dataclasses.replace(tf.procrustes, max_condition_num=40.0)
        tf = dataclasses.replace(tf, procrustes=proc)
        cfg = dataclasses.replace(cfg, procrustes=proc)
    cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # mirror bench.py's production dtype so the trace profiles the SAME
    # program the bench times (f32 here read ~2.6x slow vs the bf16 bench)
    compute_dtype = os.environ.get("DIFFREG_COMPUTE_DTYPE", "bfloat16")
    if compute_dtype and compute_dtype != "float32":
        cfg = dataclasses.replace(
            cfg,
            kpfcn=dataclasses.replace(cfg.kpfcn, compute_dtype=compute_dtype),
            coarse_transformer=dataclasses.replace(
                cfg.coarse_transformer, compute_dtype=compute_dtype))
    model = DiffusionMatchingModel(cfg)

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b, r: model.init({"params": r}, b, r, mode="train"))(batch, rng)
    fwd = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="ddim"))

    os.makedirs(args.out, exist_ok=True)
    keys = [jnp.asarray(np.asarray(k)) for k in
            jax.random.split(rng, args.steps + 1)]

    # warmup/compile outside the trace
    np.asarray(fwd(variables, batch, keys[-1])["rotation_pred"])

    records = {"eval_steps_s": [], "untraced_steps_s": [], "config": {
        "sample_steps": args.sample_steps, "batch": args.batch,
        "n_points": args.n_points, "warp_active": args.warp_active,
        "device": str(jax.devices()[0])}}
    # untraced timings FIRST: the profiler adds per-step overhead on the
    # tunneled backend, so the honest wall numbers are these — the traced
    # loop below is for the timeline breakdown, not for throughput claims
    for i in range(args.steps):
        t0 = time.perf_counter()
        out = fwd(variables, batch, keys[i])
        # barrier on a TINY output: reading the [B,704,704] conf matrix
        # back through the tunnel costs ~0.8 s/step (~32 MB) and was being
        # billed as step time — the bench reads back [B,3,3] rotations
        np.asarray(out["rotation_pred"])
        records["untraced_steps_s"].append(time.perf_counter() - t0)
    trace_dir = os.path.join(args.out, "trace")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            t0 = time.perf_counter()
            out = fwd(variables, batch, keys[i])
            np.asarray(out["rotation_pred"])        # completion barrier
            records["eval_steps_s"].append(time.perf_counter() - t0)

    if args.train:
        from diffreg_tpu.engine import (LossConfig, OptimConfig,
                                        create_train_state, make_train_step)

        ocfg = OptimConfig(optimizer="adam", lr=1e-4)
        state = create_train_state(model, batch, rng, ocfg)
        step = jax.jit(make_train_step(model, LossConfig(), ocfg))
        state, info = step(state, batch, keys[0])
        float(info["loss"])                          # compile barrier
        records["train_steps_s"] = []
        with jax.profiler.trace(os.path.join(args.out, "trace_train")):
            for i in range(args.steps):
                t0 = time.perf_counter()
                state, info = step(state, batch, keys[i])
                float(info["loss"])
                records["train_steps_s"].append(time.perf_counter() - t0)

    med = sorted(records["untraced_steps_s"])[len(records["untraced_steps_s"]) // 2]
    records["eval_pairs_per_sec"] = args.batch / med
    medt = sorted(records["eval_steps_s"])[len(records["eval_steps_s"]) // 2]
    records["traced_pairs_per_sec"] = args.batch / medt
    with open(os.path.join(args.out, "steps.json"), "w") as f:
        json.dump(records, f, indent=1)
    print(json.dumps({"out": args.out,
                      "eval_pairs_per_sec": round(records["eval_pairs_per_sec"], 3),
                      "traced_pairs_per_sec": round(records["traced_pairs_per_sec"], 3),
                      "untraced_steps_s": [round(s, 4) for s in records["untraced_steps_s"]],
                      "eval_steps_s": [round(s, 4) for s in records["eval_steps_s"]]}))


if __name__ == "__main__":
    main()
