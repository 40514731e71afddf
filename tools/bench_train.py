"""Training-throughput benchmark: train steps/sec on the full 3DMatch preset.

Secondary metric (the driver-tracked one is bench.py's pairs/s). Readback
barrier every step (see ROADMAP: block_until_ready does not block on the
tunneled backend).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from diffreg_tpu.data import make_pair, synthetic_batch
    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.engine import LossConfig, OptimConfig, create_train_state, make_train_step
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch

    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal = [make_pair(np.random.RandomState(0), n_points)[:2] for _ in range(2)]
    spec = calibrate_spec(cal, pcfg, k_cap=40)
    batch, _, _ = synthetic_batch(batch_size=batch_size, n_points=n_points,
                                  seed=0, spec=spec, cfg=pcfg)

    import dataclasses

    from diffreg_tpu.utils.precision import set_precision

    # same fast-path policy as bench.py (override with env)
    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))
    cfg = preset_3dmatch(train=True)   # warp ACTIVE in training (gate 200)
    cdt = os.environ.get("DIFFREG_COMPUTE_DTYPE", "bfloat16")
    if cdt and cdt != "float32":
        cfg = dataclasses.replace(
            cfg,
            kpfcn=dataclasses.replace(cfg.kpfcn, compute_dtype=cdt),
            coarse_transformer=dataclasses.replace(
                cfg.coarse_transformer, compute_dtype=cdt,
                flash_attention=False))
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(0)
    ocfg = OptimConfig(optimizer="sgd", lr=0.015)
    state = create_train_state(model, batch, rng, ocfg)
    step = jax.jit(make_train_step(model, LossConfig(), ocfg))

    state, info = step(state, batch, rng)
    float(info["loss"])  # compile + barrier

    iters = 5
    keys = list(jax.random.split(rng, iters))  # fold_in in the loop costs ~190ms/call
    t0 = time.perf_counter()
    for i in range(iters):
        state, info = step(state, batch, keys[i])
        float(info["loss"])
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "train_pairs_per_sec",
        "value": round(batch_size / dt, 3),
        "unit": "pairs/s",
        "detail": {"batch_size": batch_size, "sec_per_step": round(dt, 4),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
