"""2D-3D pipeline throughput: image<->cloud registrations/sec.

Secondary metric (the driver-tracked one is bench.py). Full path: DDIM
coarse matching + fine matching + device PnP-RANSAC at the reference's
RGBDV2-ish scale (476x630 crop -> here a 224x308 synthetic stand-in at the
same stride-14 coarse grid; SAMPLE_STEP from argv).

Run: python tools/bench_2d3d.py [steps] [batch]
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))

    from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
    from diffreg_tpu.engine.tester2d3d import Test2D3DConfig, TwoDThreeDTester
    from diffreg_tpu.models.pipeline_2d3d import DiffReg2D3D, Pipeline2D3DConfig
    from diffreg_tpu.nn.matching import MatchingConfig
    from diffreg_tpu.nn.point_backbone import PointBackboneConfig

    hw = (224, 308)      # stride-14 grid 16x22 = 352 patches
    cfg = Pipeline2D3DConfig(
        img_out_dim=128, img_base_dim=128,
        pcd_backbone=PointBackboneConfig(output_dim=128, init_dim=64),
        hidden_dim=256, output_dim=256, num_heads=4,
        matching=MatchingConfig(feature_dim=256),
        coarse_stride=14, sample_steps=steps)
    model = DiffReg2D3D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_2d3d_batch(batch_size=batch_size, img_hw=hw,
                                 n_points=4096, seed=0, coarse_stride=14)
    variables = jax.jit(lambda b, r: model.init({"params": r}, b, r,
                                                mode="train"))(batch, rng)

    from diffreg_tpu.ops.select import extract_correspondences

    tester = TwoDThreeDTester(model, variables,
                              Test2D3DConfig(pnp_hypotheses=4096))
    tcfg = tester.cfg
    fine_fn = tester._fine_fn(hw[0], hw[1], cfg.coarse_stride)

    @jax.jit
    def register(variables, batch, rng):
        """Forward + fine matching + PnP in ONE jit (the tester's metric
        loop does per-pair host readbacks that would measure tunnel RTT)."""
        out = model.apply(variables, batch, rng, mode="ddim")
        c = tcfg.max_fine_corr // 4
        corrs = jax.vmap(lambda m, s: extract_correspondences(m, s, c))(
            out["corr_mask"], out["conf_matrix_pred"])
        keys = jax.random.split(rng, batch.image.shape[0])
        part = out["partition"]
        fm, ir, n_corr, rot, trn, ok = fine_fn(
            out["img_feats_f"], batch.img_points, out["pcd_feats_f"],
            batch.points[0], corrs.src_idx, corrs.tgt_idx, corrs.valid,
            part.node_knn_indices, part.node_knn_masks,
            batch.transform, batch.intrinsics, keys)
        return rot, trn

    keys = list(jax.random.split(rng, 8))
    r, t = register(variables, batch, keys[0])
    np.asarray(r)   # compile + warm (readback = the only reliable barrier)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        r, t = register(variables, batch, keys[i])
        np.asarray(r)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "registered_2d3d_pairs_per_sec",
        "value": round(batch_size / dt, 3),
        "unit": "pairs/s",
        "detail": {"batch_size": batch_size, "sample_steps": steps,
                   "img_hw": list(hw), "sec_per_batch": round(dt, 4),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
