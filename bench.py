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
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16 per chip (394 TOPS int8). MFU is
# reported against the bf16 peak — the MXU's native rate and the bench's
# default compute dtype.
_PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
}


def _cost_flops(compiled) -> float | None:
    """FLOPs XLA attributes to one call of a compiled executable (None if
    the backend exposes no cost model — e.g. some tunneled/CPU builds)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


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
    # neighbor-K percentile A/B (DIFFREG_NEIGHBOR_PCT=80 trims gather rows
    # ~20%; geometric gate in tools/percentile_k_experiment.py)
    pct = float(os.environ.get("DIFFREG_NEIGHBOR_PCT", "90"))
    spec = calibrate_spec(cal_pairs, pcfg, k_cap=40, neighbor_percentile=pct)
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
    else:
        # tuned tiles from tools/tune_flash_attention.py (best on v5e at the
        # bench shape: q128 kv768 single-pass, snapshot/chip-r5a)
        tf = dataclasses.replace(
            cfg.coarse_transformer,
            flash_q_tile=int(os.environ.get("DIFFREG_FLASH_Q", "128")),
            flash_kv_tile=int(os.environ.get("DIFFREG_FLASH_KV", "768")),
            flash_out_f32=os.environ.get("DIFFREG_FLASH_F32OUT", "1") == "1")
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # head-lane alignment A/B: DIFFREG_ALIGN_HEADS=0 forces the unpadded
    # 108-dim head split (auto policy otherwise: ON for 432/4)
    if os.environ.get("DIFFREG_ALIGN_HEADS", "") == "0":
        tf = dataclasses.replace(cfg.coarse_transformer, align_heads=False)
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # half-split rotary lane layout A/B (auto-ON for 432/4 since the 2026-08-19
    # measurement: warp-active 19.2 -> 23.2 pairs/s; DIFFREG_ROTARY_HALF=0
    # forces the interleaved layout back for A/B)
    rot_half = os.environ.get("DIFFREG_ROTARY_HALF", "")
    if rot_half in ("0", "1"):
        tf = dataclasses.replace(cfg.coarse_transformer,
                                 rotary_half=rot_half == "1")
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # fused rotary+proj A/B (folds the rotary rotate-90 into the q/k kernels;
    # one [C,5C] matmul per self-attention — opt-in until measured)
    if os.environ.get("DIFFREG_FUSED_ROTARY", "") in ("0", "1"):
        tf = dataclasses.replace(
            cfg.coarse_transformer,
            fused_rotary_qkv=os.environ["DIFFREG_FUSED_ROTARY"] == "1")
        cfg = dataclasses.replace(cfg, coarse_transformer=tf)
    # attention logits layout A/B (measured a wash on v5e 2026-08-19;
    # default blsh — see TransformerConfig.logits_layout)
    layout = os.environ.get("DIFFREG_LOGITS_LAYOUT", "")
    if layout in ("bhls", "blsh"):
        tf = dataclasses.replace(cfg.coarse_transformer, logits_layout=layout)
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

    # AOT-compile once; the same compiled object serves warmup, timing, and
    # the FLOP/MFU accounting (its cost_analysis is XLA's count for exactly
    # the program being timed).
    register_c = register.lower(variables, batch, rng).compile()
    flops_per_call = _cost_flops(register_c)

    # warmup. NOTE: device->host readback (np.asarray) is the only
    # reliable completion barrier on the tunneled TPU backend —
    # block_until_ready returns early there, which silently inflates
    # throughput ~50x. Never trust block-based timing on this backend.
    r, t = register_c(variables, batch, rng)
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
        r, t = register_c(variables, batch, iter_rngs[i])
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

    register_active_c = register_active.lower(variables, batch, rng).compile()
    flops_per_call_active = _cost_flops(register_active_c)
    r, _ = register_active_c(variables, batch, rng)
    np.asarray(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, _ = register_active_c(variables, batch, iter_rngs[i])
        np.asarray(r)
    dt_active = time.perf_counter() - t0
    pairs_per_sec_active = batch_size * iters / dt_active

    # MFU: achieved TFLOP/s over the bf16 MXU peak for this device kind.
    # XLA's cost analysis counts the compiled program's FLOPs (incl. the
    # gate-0 hoisting — so the headline and warp-active programs each get
    # their own count); the tunnel RTT (~27 ms/readback) is part of the
    # measured wall time, so this is deployment MFU, not kernel-only.
    device_kind = jax.devices()[0].device_kind
    peak_tflops = _PEAK_BF16_TFLOPS.get(device_kind)

    def _mfu(flops, seconds_per_call):
        if flops is None or peak_tflops is None or seconds_per_call <= 0:
            return None, None
        achieved = flops / seconds_per_call / 1e12
        return round(achieved, 3), round(100.0 * achieved / peak_tflops, 3)

    tflops_headline, mfu_headline = _mfu(flops_per_call, dt / iters)
    tflops_active, mfu_active = _mfu(flops_per_call_active, dt_active / iters)

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
            "flops_per_batch": flops_per_call,
            "warp_active_flops_per_batch": flops_per_call_active,
            "achieved_tflops": tflops_headline,
            "mfu_pct": mfu_headline,
            "warp_active_achieved_tflops": tflops_active,
            "warp_active_mfu_pct": mfu_active,
            "mfu_basis": f"bf16 peak {peak_tflops} TFLOP/s ({device_kind})"
                         if peak_tflops else None,
        },
    }))


def _last_json_line(text: str) -> str | None:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                return line
            except ValueError:
                continue
    return None


def orchestrate(argv: list[str]) -> int:
    """Run the bench in a watchdogged subprocess with retries.

    The tunneled TPU backend can be unavailable for hours, and a process
    that touches a dead tunnel blocks FOREVER at 0% CPU (no exception) —
    so both the cheap device probe and the measurement itself run as
    subprocesses under a hard timeout. On persistent failure this still
    prints one structured JSON line (never a bare traceback), so a
    transient outage can't zero a round's perf record.
    """
    probe_timeout = float(os.environ.get("DIFFREG_BENCH_PROBE_TIMEOUT", "180"))
    run_timeout = float(os.environ.get("DIFFREG_BENCH_RUN_TIMEOUT", "2700"))
    retries = int(os.environ.get("DIFFREG_BENCH_RETRIES", "3"))
    backoff = float(os.environ.get("DIFFREG_BENCH_BACKOFF", "90"))
    # test hooks: shell-string overrides for the probe / measurement cmds
    probe_override = os.environ.get("DIFFREG_BENCH_PROBE_CMD")
    run_override = os.environ.get("DIFFREG_BENCH_RUN_CMD")

    probe_cmd = (["bash", "-c", probe_override] if probe_override else
                 [sys.executable, "-c", "import jax; jax.devices()"])
    run_cmd = (["bash", "-c", run_override] if run_override else
               [sys.executable, os.path.abspath(__file__), "--run", *argv])

    attempts = []
    for attempt in range(1, retries + 1):
        if attempt > 1:
            time.sleep(backoff * (attempt - 1))
        try:
            p = subprocess.run(probe_cmd, timeout=probe_timeout,
                               capture_output=True)
        except subprocess.TimeoutExpired:
            attempts.append(f"attempt {attempt}: device probe timed out "
                            f"after {probe_timeout:.0f}s (tunnel down)")
            continue
        if p.returncode != 0:
            attempts.append(f"attempt {attempt}: device probe rc="
                            f"{p.returncode}")
            continue
        try:
            p = subprocess.run(run_cmd, timeout=run_timeout,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            attempts.append(f"attempt {attempt}: bench run timed out after "
                            f"{run_timeout:.0f}s")
            continue
        line = _last_json_line(p.stdout or "")
        if p.returncode == 0 and line is not None:
            print(line)
            return 0
        tail = (p.stderr or "").strip().splitlines()[-3:]
        attempts.append(f"attempt {attempt}: bench run rc={p.returncode}: "
                        + " | ".join(tail))

    print(json.dumps({
        "metric": "registered_pairs_per_sec",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
        "error": f"TPU backend unavailable after {retries} attempts",
        "detail": {"attempts": attempts},
    }))
    return 1


if __name__ == "__main__":
    if "--run" in sys.argv:
        sys.argv.remove("--run")
        main()
    else:
        sys.exit(orchestrate(sys.argv[1:]))
