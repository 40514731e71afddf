"""Pallas TPU kernel: fused masked log-Sinkhorn with dustbins.

The XLA version (ops.sinkhorn.log_sinkhorn) round-trips the [N+1, M+1]
augmented matrix through HBM for every logsumexp of every iteration
(~6 passes for 3 iterations). This kernel keeps Z resident in VMEM for the
whole solve: one HBM read of the scores, one write of the result.

Grid: one program per batch element (Z at coarse problem sizes is
~2-8 MB — inside the ~16 MB VMEM budget; use the XLA path above that).
All intermediates are 2D (TPU vector layout requirement).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _sinkhorn_kernel(scores_ref, srcmask_ref, tgtmask_ref, alpha_ref, out_ref,
                     *, iters: int, n: int, m: int):
    alpha = alpha_ref[0, 0, 0]
    src_mask = srcmask_ref[0, :, :] > 0.5       # [N, 1] (pre-shaped: no transpose on TPU)
    tgt_mask = tgtmask_ref[0, :, :] > 0.5       # [1, M]

    ms = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    ns = jnp.maximum(jnp.sum(tgt_mask.astype(jnp.float32)), 1.0)
    norm = -jnp.log(ms + ns)

    valid = src_mask & tgt_mask                                 # [N, M]
    z_core = jnp.where(valid, scores_ref[0, :, :], NEG_INF)     # [N, M]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n + 1, m + 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n + 1, m + 1), 1)
    is_core = (row_ids < n) & (col_ids < m)
    z = jnp.where(is_core, jnp.pad(z_core, ((0, 1), (0, 1))),
                  jnp.full((n + 1, m + 1), alpha, jnp.float32))

    rvec = jax.lax.broadcasted_iota(jnp.int32, (n + 1, 1), 0)
    cvec = jax.lax.broadcasted_iota(jnp.int32, (1, m + 1), 1)
    log_mu = jnp.where(rvec < n, norm, jnp.log(ns) + norm)      # [N+1, 1]
    log_nu = jnp.where(cvec < m, norm, jnp.log(ms) + norm)      # [1, M+1]

    u = jnp.zeros((n + 1, 1), jnp.float32)
    v = jnp.zeros((1, m + 1), jnp.float32)

    def lse(mat, axis):
        mx = jnp.max(mat, axis=axis, keepdims=True)
        return mx + jnp.log(jnp.sum(jnp.exp(mat - mx), axis=axis, keepdims=True))

    for _ in range(iters):
        u = log_mu - lse(z + v, axis=1)
        v = log_nu - lse(z + u, axis=0)

    out_ref[0, :, :] = z + u + v - norm


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def log_sinkhorn_pallas(scores, alpha, iters, src_mask, tgt_mask, interpret=False):
    """Drop-in for ops.sinkhorn.log_sinkhorn (masked path).

    scores [B, N, M] -> log assignment [B, N+1, M+1].
    """
    b, n, m = scores.shape
    alpha_arr = jnp.broadcast_to(
        jnp.asarray(alpha, jnp.float32).reshape(1, 1, 1), (b, 1, 1))
    src = src_mask.astype(jnp.float32)[:, :, None]   # [B, N, 1]
    tgt = tgt_mask.astype(jnp.float32)[:, None, :]   # [B, 1, M]

    kernel = functools.partial(_sinkhorn_kernel, iters=int(iters), n=n, m=m)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n + 1, m + 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n + 1, m + 1), jnp.float32),
        interpret=interpret,
    )(scores, src, tgt, alpha_arr)
