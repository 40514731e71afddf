"""Benchmark: registered pairs/sec through the full diffusion pipeline.

Measures the end-to-end registration rate — KPFCN backbone + DDIM reverse
loop (sample_steps configurable) + on-device RANSAC pose — on realistic
3DMatch-scale shapes, batched, on the available accelerator.

Prints ONE JSON line:
  {"metric": "registered_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 50.0}
(the 50 pairs/s v5e-8 target from BASELINE.md; single-chip numbers scale
~linearly over the data axis).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os

    # Default-precision matmuls for the bench: the pose-critical
    # contractions (Procrustes covariance, rotation metrics) pin HIGHEST
    # explicitly and are unaffected; the attention/matching einsums drop
    # from 3-pass f32 to single-pass bf16 (~3.5x on the per-step denoiser).
    # DIFFREG_PRECISION=highest restores the parity-run policy.
    prec = os.environ.get("DIFFREG_PRECISION", "default")
    from diffreg_tpu.utils.precision import set_precision

    set_precision(prec)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_points = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from diffreg_tpu.data import ShapeSpec, synthetic_batch
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.eval import ransac_pose
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.select import extract_correspondences

    # 3DMatch-scale bucket: ~4k raw points/side; K and level sizes from the
    # calibration pass (the reference's calibrate_neighbors equivalent).
    from diffreg_tpu.data import make_pair
    from diffreg_tpu.data.calibrate import calibrate_spec

    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal_rng = np.random.RandomState(0)
    cal_pairs = [make_pair(cal_rng, n_points)[:2] for _ in range(2)]
    spec = calibrate_spec(cal_pairs, pcfg, k_cap=40)
    batch, _, _ = synthetic_batch(
        batch_size=batch_size, n_points=n_points, seed=0, spec=spec, cfg=pcfg)

    import dataclasses

    cfg = preset_3dmatch(sample_steps=steps)
    # XLA attention measured faster than the Pallas flash kernel at 3DMatch
    # coarse sizes (704 tokens, head dim 108) on v5e; DIFFREG_FLASH=1 opts
    # back into the kernel
    if os.environ.get("DIFFREG_FLASH", "0") == "0":
        tf = dataclasses.replace(cfg.coarse_transformer, flash_attention=False)
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # head-lane alignment A/B: DIFFREG_ALIGN_HEADS=0 forces the unpadded
    # 108-dim head split (auto policy otherwise: ON for 432/4)
    if os.environ.get("DIFFREG_ALIGN_HEADS", "") == "0":
        tf = dataclasses.replace(cfg.coarse_transformer, align_heads=False)
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # bf16 conv gather/contraction (f32 accumulation) — ~1.3x on the
    # gather-bound backbone; override with DIFFREG_COMPUTE_DTYPE=float32
    compute_dtype = os.environ.get("DIFFREG_COMPUTE_DTYPE", "bfloat16")
    if compute_dtype and compute_dtype != "float32":
        cfg = dataclasses.replace(
            cfg,
            kpfcn=dataclasses.replace(cfg.kpfcn, compute_dtype=compute_dtype),
            coarse_transformer=dataclasses.replace(
                cfg.coarse_transformer, compute_dtype=compute_dtype))
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b, r: model.init({"params": r}, b, r, mode="train"))(batch, rng)

    max_corr = spec.n_src + spec.n_tgt

    @jax.jit
    def register(variables, batch, rng):
        out = model.apply(variables, batch, rng, mode="ddim")

        def one_pair(conf, corr_mask, s_pcd, t_pcd, key):
            corrs = extract_correspondences(corr_mask, conf, max_corr)
            src_c = s_pcd[corrs.src_idx]
            tgt_c = t_pcd[corrs.tgt_idx]
            res = ransac_pose(key, src_c, tgt_c, corrs.valid,
                              distance_threshold=0.05, num_hypotheses=8192)
            return res.rotation, res.translation

        keys = jax.random.split(rng, batch.src_mask.shape[0])
        rot, trn = jax.vmap(one_pair)(
            out["conf_matrix_pred"], out["corr_mask"], out["s_pcd"], out["t_pcd"], keys)
        return rot, trn

    # warmup/compile. NOTE: device->host readback (np.asarray) is the only
    # reliable completion barrier on the tunneled TPU backend —
    # block_until_ready returns early there, which silently inflates
    # throughput ~50x. Never trust block-based timing on this backend.
    r, t = register(variables, batch, rng)
    np.asarray(r)

    # timed runs, forcing completion every iteration via readback.
    # rngs are derived BEFORE the loop: a per-iteration fold_in is its own
    # tiny device program whose dispatch costs ~190 ms/call on the tunneled
    # backend and was silently counted as registration time.
    iters = 5
    iter_rngs = [np.asarray(k) for k in jax.random.split(rng, iters)]
    iter_rngs = [jnp.asarray(k) for k in iter_rngs]
    t0 = time.perf_counter()
    for i in range(iters):
        r, t = register(variables, batch, iter_rngs[i])
        np.asarray(r)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch_size * iters / dt

    # warp-ACTIVE variant: condition gate 40 like the 4DMatch configs
    # (Diff-Reg-4dmatch/configs/test/4dmatch.yaml:53), so every DDIM step
    # pays Sinkhorn + Procrustes + warp (the 3dmatch test config's gate of 0
    # statically skips the warp — an identity-warp number alone would
    # flatter the bench; VERDICT.md round-1 weak #7)
    proc_active = dataclasses.replace(
        cfg.coarse_transformer.procrustes, max_condition_num=40.0)
    tf_active = dataclasses.replace(cfg.coarse_transformer, procrustes=proc_active)
    cfg_active = dataclasses.replace(cfg, coarse_transformer=tf_active,
                                     procrustes=proc_active)
    model_a = DiffusionMatchingModel(cfg_active)

    @jax.jit
    def register_active(variables, batch, rng):
        out = model_a.apply(variables, batch, rng, mode="ddim")

        def one_pair(conf, corr_mask, s_pcd, t_pcd, key):
            corrs = extract_correspondences(corr_mask, conf, max_corr)
            res = ransac_pose(key, s_pcd[corrs.src_idx], t_pcd[corrs.tgt_idx],
                              corrs.valid, distance_threshold=0.05,
                              num_hypotheses=8192)
            return res.rotation, res.translation

        keys = jax.random.split(rng, batch.src_mask.shape[0])
        return jax.vmap(one_pair)(
            out["conf_matrix_pred"], out["corr_mask"], out["s_pcd"],
            out["t_pcd"], keys)

    r, _ = register_active(variables, batch, rng)
    np.asarray(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, _ = register_active(variables, batch, iter_rngs[i])
        np.asarray(r)
    dt_active = time.perf_counter() - t0
    pairs_per_sec_active = batch_size * iters / dt_active

    # Baseline: >= 50 pairs/s on v5e-8 (BASELINE.md) == 6.25 pairs/s/chip;
    # the data axis scales linearly (pairs are independent), so single-chip
    # throughput is compared against the per-chip share.
    n_chips = jax.device_count()
    per_chip_target = 50.0 / 8.0
    print(json.dumps({
        "metric": "registered_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / (per_chip_target * n_chips), 4),
        "detail": {
            "baseline_basis": "50 pairs/s on v5e-8 == 6.25 pairs/s/chip",
            "n_chips": n_chips,
            "sample_steps": steps,
            "batch_size": batch_size,
            "n_points_per_side": n_points,
            "device": str(jax.devices()[0]),
            "seconds_per_batch": round(dt / iters, 4),
            "compute_dtype": compute_dtype,
            "warp_active_pairs_per_sec": round(pairs_per_sec_active, 3),
            "warp_active_seconds_per_batch": round(dt_active / iters, 4),
        },
    }))


if __name__ == "__main__":
    main()
