"""Per-component timing of the warp-active DDIM step at bench shapes.

Decomposes the ~19 ms/step (round-2 measurement) into: warp projection
(Sinkhorn+Procrustes), volumetric PE recompute, the 6-layer denoising
transformer (and its attention/Dense split), and the per-step matcher.
Each component runs inside a lax.scan of N steps with a genuine carry
dependence (so XLA cannot hoist it) and one readback at the end — the only
reliable timing pattern on the tunneled backend (see ROADMAP.md).

Run on the real chip: python tools/profile_denoiser.py [steps]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(name, body, carry0, steps, iters=4):
    """Time a scan of ``body`` over ``steps`` iterations; report ms/step."""
    @jax.jit
    def run(c):
        def f(carry, _):
            return body(carry), None
        out, _ = jax.lax.scan(f, c, None, length=steps)
        return sum(jnp.sum(l) for l in jax.tree.leaves(out))

    r = run(carry0)
    np.asarray(r)                       # compile + completion barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(carry0))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt/steps*1e3:8.3f} ms/step   ({dt*1e3:7.1f} ms total)")
    return dt / steps


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from diffreg_tpu.data import make_pair, synthetic_batch
    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.utils.precision import set_precision

    set_precision(os.environ.get("DIFFREG_PRECISION", "default"))

    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal = [make_pair(np.random.RandomState(0), 4096)[:2] for _ in range(2)]
    spec = calibrate_spec(cal, pcfg, k_cap=40)
    batch, _, _ = synthetic_batch(batch_size=16, n_points=4096, seed=0,
                                  spec=spec, cfg=pcfg)
    print(f"spec: S/T={spec.n_src}/{spec.n_tgt}")

    cfg = preset_3dmatch(sample_steps=steps)
    proc = dataclasses.replace(cfg.coarse_transformer.procrustes,
                               max_condition_num=40.0)
    tf = dataclasses.replace(cfg.coarse_transformer, procrustes=proc,
                             flash_attention=False, compute_dtype="bfloat16")
    cfg = dataclasses.replace(cfg, coarse_transformer=tf, procrustes=proc,
                              kpfcn=dataclasses.replace(
                                  cfg.kpfcn, compute_dtype="bfloat16"))
    model = DiffusionMatchingModel(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b, r: model.init({"params": r}, b, r,
                                                mode="train"))(batch, rng)

    b = batch.src_mask.shape[0]
    s, t_ = spec.n_src, spec.n_tgt
    d = cfg.coarse_transformer.feature_dim

    # materialize encode outputs once (loop-invariant in the real scan)
    src_feats, tgt_feats, s_pcd, t_pcd = jax.jit(
        lambda v, bb: model.apply(v, bb, method=lambda m, x: m.encode(x)))(
        variables, batch)
    src_mask, tgt_mask = batch.src_mask, batch.tgt_mask
    x0 = jax.random.normal(rng, (b, s, t_))

    # ---- full warp-active DDIM step (reference composition) ----
    def full_fwd(v, bb, r):
        return model.apply(v, bb, r, steps,
                           method=lambda m, b2, r2, ss: m.ddim_sample(
                               b2, r2, sample_steps=ss))

    f = jax.jit(lambda r: sum(jnp.sum(l) for l in jax.tree.leaves(
        full_fwd(variables, batch, r))
        if jnp.issubdtype(l.dtype, jnp.floating)))
    np.asarray(f(rng))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(f(rng))
    full = (time.perf_counter() - t0) / 3
    print(f"{'FULL ddim_sample (incl. final skh/extract)':42s} "
          f"{full/steps*1e3:8.3f} ms/step   ({full*1e3:7.1f} ms total)")

    # ---- components under model.apply with bound params ----
    def apply_m(method, *args):
        return model.apply(variables, *args, method=method)

    # warp projection: sinkhorn + procrustes + warp application
    def warp_body(m, x):
        warped, _, _, _ = m._warp_from_noisy_matrix(
            x, s_pcd, t_pcd, src_mask, tgt_mask)
        return x * 0.999 + warped.sum() * 1e-9    # carry-dependent

    timed_scan("warp (sinkhorn+procrustes+apply)",
               lambda x: apply_m(warp_body, x), x0, steps)

    # volumetric PE of warped source (recomputed every step)
    from diffreg_tpu.ops.position_encoding import volumetric_pe

    tcf = cfg.coarse_transformer

    def vpe(xyz):
        return volumetric_pe(xyz, tcf.feature_dim, tcf.vol_origin,
                             tcf.voxel_size, tcf.pe_type)

    def pe_body(x):
        pe = vpe(s_pcd + x[:, :1, :3])
        return x * 0.999 + pe.sum() * 1e-9

    timed_scan("volumetric PE (src side)", pe_body, x0, steps)

    # 6-layer denoising transformer (positions depend on carry)
    def tf_body(m, x):
        sw = s_pcd + x[:, :1, :3] * 1e-6
        sf, tf_, _, _, _ = m.denoising_transformer(
            src_feats, tgt_feats, sw, t_pcd, src_mask, tgt_mask)
        return x * 0.999 + (sf.sum() + tf_.sum()) * 1e-9

    timed_scan("denoising transformer (6 layers)",
               lambda x: apply_m(tf_body, x), x0, steps)

    # matcher (per-step x_start extraction)
    def match_body(m, x):
        sw = s_pcd + x[:, :1, :3] * 1e-6
        pe_s = vpe(sw)
        pe_t = vpe(t_pcd)
        conf, _ = m.denoising_matching(src_feats, tgt_feats, pe_s, pe_t,
                                       src_mask, tgt_mask)
        return x * 0.999 + conf.sum() * 1e-9

    timed_scan("matcher (proj+sinkhorn, incl PE)",
               lambda x: apply_m(match_body, x), x0, steps)

    # ---- attention sublayer in isolation at [2B, L, D] ----
    from diffreg_tpu.nn.transformer import GeometryAttentionLayer

    from diffreg_tpu.nn.transformer import resolve_head_pad

    feats2 = jnp.concatenate([src_feats, tgt_feats], axis=0)
    mask2 = jnp.concatenate([src_mask, tgt_mask], axis=0)
    pe2 = jax.jit(lambda: jnp.concatenate([vpe(s_pcd), vpe(t_pcd)], axis=0))()
    for pad in (None, resolve_head_pad(d, cfg.coarse_transformer.n_head, None)):
        layer = GeometryAttentionLayer(d, cfg.coarse_transformer.n_head,
                                       "rotary", compute_dtype="bfloat16",
                                       head_pad=pad)
        lv = layer.init(rng, feats2, feats2, pe2, pe2, mask2, mask2)

        def attn_body(x, layer=layer, lv=lv):
            y = layer.apply(lv, x, x, pe2, pe2, mask2, mask2)
            return y * 0.999

        timed_scan(f"1 attention layer [{2*b},{s},{d}] head_pad={pad}",
                   attn_body, feats2, steps)

    # Dense-only proxy: the layer's 6 matmuls without attention
    import flax.linen as nn

    class DenseChain(nn.Module):
        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16
            x = x.astype(dt)
            h = nn.Dense(d, use_bias=False, dtype=dt)(x)
            h = nn.Dense(d, use_bias=False, dtype=dt)(h)
            h = nn.Dense(d, use_bias=False, dtype=dt)(h)
            h = nn.Dense(d, use_bias=False, dtype=dt)(h)
            y = jnp.concatenate([x, h], axis=-1)
            y = nn.Dense(2 * d, use_bias=False, dtype=dt)(y)
            y = nn.Dense(d, use_bias=False, dtype=dt)(nn.relu(y))
            return y.astype(jnp.float32)

    dc = DenseChain()
    dcv = dc.init(rng, feats2)

    def dense_body(x):
        return x * 0.999 + dc.apply(dcv, x) * 1e-9

    timed_scan(f"dense chain (6 matmuls) [{2*b},{s},{d}]",
               dense_body, feats2, steps)


if __name__ == "__main__":
    main()
