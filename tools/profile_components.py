"""Component-level timing on the real chip: where do the milliseconds go?

Times backbone-only, DDIM at several step counts, RANSAC, and Sinkhorn in
isolation to target kernel work. Also dumps a jax.profiler trace when
--trace is passed (view with tensorboard or xprof).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scalarize(fn):
    """Wrap fn so it returns one on-device scalar: forces full execution
    while keeping the (slow) tunnel readback negligible."""
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(l) for l in jax.tree.leaves(out)
                   if jnp.issubdtype(l.dtype, jnp.floating))
    return jax.jit(wrapped)


def _readback(out):
    # device->host readback is the only reliable completion barrier on the
    # tunneled TPU backend (block_until_ready returns early there); callers
    # must keep outputs tiny (scalarize) or the tunnel transfer dominates.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _readback(out)
    return (time.perf_counter() - t0) / iters


def main():
    trace = "--trace" in sys.argv

    from diffreg_tpu.data import make_pair, synthetic_batch
    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.eval import ransac_pose
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.sinkhorn import log_sinkhorn

    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal = [make_pair(np.random.RandomState(0), 4096)[:2] for _ in range(2)]
    spec = calibrate_spec(cal, pcfg, k_cap=40)
    batch, _, _ = synthetic_batch(batch_size=16, n_points=4096, seed=0,
                                  spec=spec, cfg=pcfg)
    print(f"spec: points={spec.n_points} k={spec.k_neighbors} "
          f"S/T={spec.n_src}/{spec.n_tgt}")

    cfg = preset_3dmatch(sample_steps=20)
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b, r: model.init({"params": r}, b, r, mode="train"))(batch, rng)

    encode = scalarize(lambda v, b: model.apply(v, b, method=lambda m, bb: m.encode(bb)))
    t_enc = timed(encode, variables, batch)
    print(f"backbone encode+split: {t_enc*1e3:8.2f} ms/batch16")

    for steps in (1, 5, 20):
        fwd = scalarize(lambda v, b, r, s=steps: model.apply(
            v, b, r, s, method=lambda m, bb, rr, ss: m.ddim_sample(bb, rr, sample_steps=ss)))
        t = timed(fwd, variables, batch, rng, iters=5)
        print(f"ddim steps={steps:3d}:        {t*1e3:8.2f} ms/batch16")

    # isolated pieces at pipeline shapes
    s, t_ = spec.n_src, spec.n_tgt
    x = jax.random.normal(rng, (16, s, t_))
    sm = jnp.ones((16, s), bool)
    tm = jnp.ones((16, t_), bool)
    f_skh = scalarize(lambda xx: log_sinkhorn(xx, 1.0, 3, sm, tm))
    print(f"sinkhorn x3 [16,{s},{t_}]: {timed(f_skh, x)*1e3:8.2f} ms")

    src = jax.random.normal(rng, (512, 3))
    tgt = src @ jnp.eye(3) + 0.1
    f_ransac = scalarize(lambda k: ransac_pose(k, src, tgt, jnp.ones(512, bool),
                                               num_hypotheses=8192))
    print(f"ransac 8192 hyp x1 pair:  {timed(f_ransac, rng)*1e3:8.2f} ms")

    if trace:
        fwd20 = jax.jit(lambda v, b, r: model.apply(v, b, r, mode="ddim"))
        with jax.profiler.trace("/tmp/diffreg_trace"):
            out = fwd20(variables, batch, rng)
            jax.block_until_ready(out["conf_matrix_pred"])
        print("trace written to /tmp/diffreg_trace")


if __name__ == "__main__":
    main()
