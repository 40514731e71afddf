"""On-chip cost of the frozen 2D-3D towers: DINOv2 ViT-L/14 + DepthAnything.

The reference runs both towers INSIDE its 2D-3D forward on every sample
(Diff-Reg-2d3d/experiments/.../model.py:354-358 — ViT-L/14 on the 630x476
crop dominates its compute). Our design runs them once per sample at data
load (models/towers.py) — this tool turns that "towers dominate" claim into
a measurement:

  * ms/image for each tower at the RGBDV2 shape (476x630, stride-14 exact),
    bf16 params + activations, steady-state with readback barriers;
  * amortized end-to-end 2D-3D pairs/s with the towers IN the loop vs
    precomputed, combining with the matcher-loop time from
    tools/bench_2d3d.py (snapshot/chip-r5a/bench_2d3d.json).

Random weights (same FLOPs/latency as converted ones — timing only).

Run: python tools/bench_towers.py [batch] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=10):
    """Steady-state median seconds, two ways: compute-only (barrier on a
    checksum that depends on the full output but transfers ~4 bytes — the
    honest device time) and with the full-output host readback (what the
    precompute pipeline actually pays per sample; the tunnel moves ~40 MB/s,
    so reading 12 MB of ViT-L tokens would otherwise be billed as compute).
    block_until_ready does not block on the tunneled backend."""
    small = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0]
                                       .astype(jnp.float32)))
    np.asarray(small(*args))                     # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(small(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    compute = ts[len(ts) // 2]
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # warmup the full path
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return compute, ts[len(ts) // 2]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    h, w = 476, 630                   # RGBDV2 shape, exact multiples of 14
    dev = jax.devices()[0]
    print(f"device: {dev}, towers at {h}x{w}, batch {batch}", flush=True)

    from diffreg_tpu.nn.depth_anything import DepthAnything, DPTConfig
    from diffreg_tpu.nn.dinov2 import DinoVisionTransformer, vit_large_config

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)

    results = {}

    # --- DINOv2 ViT-L/14, bf16 params + input (f32 would be the torch
    # reference's dtype; bf16 is the TPU production point) ---------------
    vit_cfg = vit_large_config()
    dino = DinoVisionTransformer(vit_cfg)
    dvars = jax.eval_shape(lambda r: dino.init(r, img[:1]), rng)
    dvars = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16)
                         if jnp.issubdtype(s.dtype, jnp.floating)
                         else jnp.zeros(s.shape, s.dtype), dvars)
    dino_fn = jax.jit(lambda v, x: dino.apply(v, x.astype(jnp.bfloat16))[0])
    s, s_rb = timed(dino_fn, dvars, img, reps=reps)
    results["dino_vitl14_ms_per_image_bf16"] = s * 1000 / batch
    results["dino_vitl14_ms_per_image_with_readback"] = s_rb * 1000 / batch
    print(f"DINOv2 ViT-L/14 bf16: {s*1000/batch:.1f} ms/image compute "
          f"({batch/s:.2f} img/s); {s_rb*1000/batch:.1f} with token readback",
          flush=True)

    # --- DepthAnything (ViT-L/14 encoder + DPT head) ---------------------
    da = DepthAnything(vit_cfg, DPTConfig())
    avars = jax.eval_shape(lambda r: da.init(r, img[:1]), rng)
    avars = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16)
                         if jnp.issubdtype(s.dtype, jnp.floating)
                         else jnp.zeros(s.shape, s.dtype), avars)
    da_fn = jax.jit(lambda v, x: da.apply(v, x.astype(jnp.bfloat16)))
    s, s_rb = timed(da_fn, avars, img, reps=reps)
    results["depth_anything_ms_per_image_bf16"] = s * 1000 / batch
    results["depth_anything_ms_per_image_with_readback"] = s_rb * 1000 / batch
    print(f"DepthAnything bf16: {s*1000/batch:.1f} ms/image compute "
          f"({batch/s:.2f} img/s); {s_rb*1000/batch:.1f} with map readback",
          flush=True)

    # --- amortization: combine with the committed matcher-loop number ----
    loop_json = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "snapshot", "chip-r5a", "bench_2d3d.json")
    if os.path.exists(loop_json):
        with open(loop_json) as f:
            loop = json.load(f)
        loop_s_per_pair = 1.0 / loop["value"]
        towers_s_per_pair = (results["dino_vitl14_ms_per_image_bf16"] +
                             results["depth_anything_ms_per_image_bf16"]) / 1000
        results["matcher_loop_pairs_per_sec"] = loop["value"]
        results["towers_in_loop_pairs_per_sec"] = round(
            1.0 / (loop_s_per_pair + towers_s_per_pair), 3)
        results["tower_fraction_of_in_loop_time"] = round(
            towers_s_per_pair / (loop_s_per_pair + towers_s_per_pair), 3)
        print(f"amortized: towers-in-loop {results['towers_in_loop_pairs_per_sec']}"
              f" pairs/s vs precomputed {loop['value']} pairs/s "
              f"(towers = {100*results['tower_fraction_of_in_loop_time']:.0f}% "
              "of in-loop time)", flush=True)

    print(json.dumps({"metric": "tower_ms_per_image", "device": str(dev),
                      "img_hw": [h, w], "batch": batch, **results}))


if __name__ == "__main__":
    main()
