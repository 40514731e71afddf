"""Pallas TPU kernel: fused post-gather KPConv.

The XLA lowering of ops.kpconv materializes three HBM intermediates per
conv — the gathered rows [N, K, 3+C], the influence weights [N, K, P] and
the per-kernel-point accumulator [N, P, C] — and contracts them with a
badly-tiled [P, K] x [K, C] batched matmul (P=15, K~40: ~4% MXU
utilization). Measured on v5e (2026-08): the neighbor-row gather itself is
row-latency-bound (~5-10 ns/row) and accounts for only ~half of each conv;
the rest is this post-gather traffic.

This kernel consumes the (unavoidable, XLA-produced) gathered rows ONCE and
keeps everything else in VMEM:

  grid = (B, N/TILE_Q); each program streams its [K, TILE_Q, 3+C] block,
  loops over K in-kernel accumulating the influence-weighted features in a
  [TILE_Q, P, C] VMEM accumulator, and finishes with P MXU matmuls
  [TILE_Q, C] @ [C, Cout]. K lives INSIDE the kernel: an earlier variant
  with K as a grid dimension spent more on ~20k grid-step overheads than
  the convs themselves.

Density normalization preserves the reference quirk (blocks.py:354-357):
a neighbor counts iff its feature-sum is positive (shadow rows gather 0s).

Training still works: ``fused_kpconv`` carries a custom VJP whose backward
evaluates the differentiable XLA formulation at the saved inputs — the
same math, so gradients agree with the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gathered_ref, q_ref, kpt_ref, k2_ref, w_ref, out_ref,
            acc_ref, cnt_ref, *, n_k: int, n_p: int, extent: float):
    acc_ref[...] = jnp.zeros_like(acc_ref)
    cnt_ref[...] = jnp.zeros_like(cnt_ref)
    q = q_ref[0]                                       # [TQ, 3]
    kpt = kpt_ref[...]                                 # [3, P]
    k2 = k2_ref[...]                                   # [1, P]

    def body(k, _):
        g = gathered_ref[0, k]                         # [TQ, 3+C]
        rel = g[:, :3] - q
        feats = g[:, 3:]                               # [TQ, C]
        n2 = jnp.sum(rel * rel, axis=1, keepdims=True)
        # 3-term contraction on the VPU in full f32 (a single-pass MXU dot
        # rounds inputs to bf16 — ~1e-2 relative error in the distances)
        cross = (rel[:, 0:1] * kpt[0:1, :] + rel[:, 1:2] * kpt[1:2, :]
                 + rel[:, 2:3] * kpt[2:3, :])          # [TQ, P]
        sq_d = jnp.maximum(n2 + k2 - 2.0 * cross, 0.0)
        infl = jnp.maximum(1.0 - jnp.sqrt(sq_d) / extent, 0.0)  # linear
        acc_ref[...] += infl[:, :, None] * feats[:, None, :]
        cnt_ref[...] += (jnp.sum(feats, axis=1, keepdims=True) > 0.0
                         ).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_k, body, 0)

    out = jnp.zeros_like(out_ref[0])
    for p in range(n_p):
        out += jnp.dot(acc_ref[:, p, :], w_ref[p],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    out_ref[0] = out / jnp.maximum(cnt_ref[...], 1.0)


def pick_tile(nq: int, n_k: int, d: int, n_p: int, cin: int,
              budget_bytes: int = 11 * 2**20):
    """Largest tile so (double-buffered block + accumulator) fits VMEM.

    VMEM stores the last dim lane-padded to a multiple of 128, so the
    streamed [K, TILE_Q, D] block costs K*TILE_Q*pad128(D)*4 bytes."""
    d_pad = -(-d // 128) * 128
    cin_pad = -(-cin // 128) * 128
    for t in (512, 256, 128, 64, 32, 16, 8):
        if nq % t:
            continue
        need = 2 * n_k * t * d_pad * 4 + t * n_p * cin_pad * 4
        if need <= budget_bytes:
            return t
    return None


def _fused_kpconv_fwd_impl(gathered, q_pts, kernel_points, weights, extent,
                           tile_q):
    """gathered: [B, K, N, 3+C] (K-major so blocks are (1, K, TILE_Q, D))."""
    b, n_k, n, d = gathered.shape
    n_p, cin, cout = weights.shape
    assert d == cin + 3, (d, cin)
    assert n % tile_q == 0, (n, tile_q)

    kpt = jnp.swapaxes(kernel_points, 0, 1)            # [3, P]
    k2 = jnp.sum(kernel_points * kernel_points, -1)[None, :]  # [1, P]

    kernel = functools.partial(_kernel, n_k=n_k, n_p=n_p, extent=float(extent))
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile_q),
        in_specs=[
            pl.BlockSpec((1, n_k, tile_q, d), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 3), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_p), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, cin, cout), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, cout), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, n_p, cin), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
        ],
    )(gathered, q_pts, kpt, k2, weights)


def _xla_post_gather(gathered, q_pts, kernel_points, weights, extent):
    """Differentiable XLA twin of the kernel (same math; used for VJP and
    as the non-TPU fallback). gathered: [B, K, N, 3+C]."""
    rel = gathered[..., :3] - q_pts[:, None, :, :]     # [B, K, N, 3]
    feats = gathered[..., 3:]                          # [B, K, N, C]
    n2 = jnp.sum(rel * rel, axis=-1, keepdims=True)
    k2 = jnp.sum(kernel_points * kernel_points, axis=-1)
    cross = jnp.einsum("bknc,pc->bknp", rel, kernel_points,
                       precision=jax.lax.Precision.HIGHEST)
    sq_d = jnp.maximum(n2 + k2[None, None, None] - 2.0 * cross, 0.0)
    infl = jnp.maximum(1.0 - jnp.sqrt(sq_d) / extent, 0.0)
    weighted = jnp.einsum("bknp,bknc->bnpc", infl, feats,
                          precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bnpc,pcd->bnd", weighted, weights,
                     precision=jax.lax.Precision.HIGHEST)
    cnt = jnp.sum(jnp.sum(feats, axis=-1) > 0.0, axis=1)
    return out / jnp.maximum(cnt, 1)[..., None].astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_kpconv(gathered, q_pts, kernel_points, weights, extent, tile_q=256):
    """Fused post-gather KPConv: [B, K, N, 3+C] rows -> [B, N, Cout].

    ``gathered`` rows are [support_xyz ++ support_features], shadow rows
    [1e6, 1e6, 1e6, 0...]. Linear influence, sum aggregation (the only
    modes on the Diff-Reg live path).
    """
    return _fused_kpconv_fwd_impl(gathered, q_pts, kernel_points, weights,
                                  extent, tile_q)


def _fwd(gathered, q_pts, kernel_points, weights, extent, tile_q):
    out = _fused_kpconv_fwd_impl(gathered, q_pts, kernel_points, weights,
                                 extent, tile_q)
    return out, (gathered, q_pts, kernel_points, weights)


def _bwd(extent, tile_q, res, g):
    gathered, q_pts, kernel_points, weights = res
    _, vjp = jax.vjp(
        lambda ga, qp, kp, w: _xla_post_gather(ga, qp, kp, w, extent),
        gathered, q_pts, kernel_points, weights)
    return vjp(g)


fused_kpconv.defvjp(_fwd, _bwd)
