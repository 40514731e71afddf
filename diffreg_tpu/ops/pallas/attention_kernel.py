"""Pallas TPU kernel: masked multi-head attention (flash-style, fused).

Fuses QK^T + mask + softmax + AV for the geometry attention layers so the
[B, H, L, S] logits tensor never touches HBM. Online-softmax over key tiles;
key-validity mask applied reference-style: only (valid query, invalid key)
pairs are suppressed (transformero.py:81-82 — invalid-query rows attend
everywhere, their outputs are masked downstream).

Shapes are the coarse-matching scale (L, S ~ 0.5-2k, head dim ~108 padded to
128 by Mosaic): one (batch, head, q-tile) program; keys streamed in tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _attn_kernel(q_ref, k_ref, v_ref, kvmask_ref, out_ref, *, scale, kv_tile, n_kv):
    """Block shapes: q [1, 1, Lt, D], k/v [1, 1, S, D], kvmask [1, 1, S],
    out [1, 1, Lt, D]. Loops over key tiles with online softmax."""
    q = q_ref[0, 0, :, :] * scale                        # [Lt, D]
    lt = q.shape[0]
    d = q.shape[1]

    m_i = jnp.full((lt, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((lt, 1), jnp.float32)
    acc = jnp.zeros((lt, d), jnp.float32)

    steps = n_kv // kv_tile

    def body(si, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, 0, pl.ds(si * kv_tile, kv_tile), :]     # [Kt, D]
        v = v_ref[0, 0, pl.ds(si * kv_tile, kv_tile), :]
        kv_valid = kvmask_ref[0, 0, pl.ds(si * kv_tile, kv_tile)] > 0.5

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [Lt, Kt]
        s = jnp.where(kv_valid[None, :], s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                                # [Lt, Kt]
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, steps, body, (m_i, l_i, acc))
    out = acc / jnp.maximum(l_i, 1e-30)
    out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def masked_attention_pallas(q, k, v, kv_mask, q_tile=256, kv_tile=256,
                            interpret=False, scale=None, out_dtype=None):
    """q [B, H, L, D], k/v [B, H, S, D], kv_mask [B, S] -> out [B, H, L, D].

    ``scale`` overrides the 1/sqrt(D) logit scale — required when D is a
    lane-padded head dim (nn.transformer align_heads) and the true head dim
    must set the temperature.

    ``out_dtype`` sets the output element type (default f32, the historic
    behavior); pass the input dtype (bf16) to halve the output HBM write
    when the consumer is a bf16 merge projection anyway. Accumulation is
    always f32 in VMEM regardless.

    ``kv_tile >= S`` degenerates to a single-pass softmax (no online
    rescaling) — the right mode at coarse-matching sizes where all keys fit
    in VMEM; tiles are autotunable via tools/tune_flash_attention.py.

    Reference mask semantics: invalid keys suppressed for all queries
    (invalid queries produce garbage rows that callers mask, exactly like
    the XLA path).

    Differentiable: forward runs the fused kernel; the backward pass
    recomputes the attention probabilities with plain XLA einsums (flash
    backward kernels are a later optimization — training throughput is not
    attention-bound here).
    """
    return _forward(q, k, v, kv_mask, q_tile, kv_tile, interpret, scale,
                    out_dtype)


def _forward(q, k, v, kv_mask, q_tile=256, kv_tile=256, interpret=False,
             scale=None, out_dtype=None):
    b, h, l, d = q.shape
    s = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if out_dtype is None:
        out_dtype = jnp.float32
    # a kv_tile beyond the (lane-rounded) key count just means "one pass"
    kv_tile = min(kv_tile, ((s + 127) // 128) * 128)

    pad_l = (-l) % q_tile
    pad_s = (-s) % kv_tile
    if pad_l:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_l), (0, 0)))
    if pad_s:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_s)))
    lp, sp = l + pad_l, s + pad_s

    kvm = kv_mask.astype(jnp.float32)[:, None, :]        # [B, 1, S]

    kernel = functools.partial(_attn_kernel, scale=scale, kv_tile=kv_tile, n_kv=sp)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, lp // q_tile),
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lp, d), out_dtype),
        interpret=interpret,
    )(q, k, v, kvm)
    return out[:, :, :l, :]


def _attn_probs(q, k, kv_mask, scale=None):
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhld,bhsd->bhls", q, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    return jax.nn.softmax(s, axis=-1)


def _fwd(q, k, v, kv_mask, q_tile, kv_tile, interpret, scale, out_dtype):
    out = _forward(q, k, v, kv_mask, q_tile, kv_tile, interpret, scale,
                   out_dtype)
    return out, (q, k, v, kv_mask)


def _bwd(q_tile, kv_tile, interpret, scale, out_dtype, res, g):
    q, k, v, kv_mask = res
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    g = g.astype(jnp.float32)
    p = _attn_probs(q, k, kv_mask, scale)                             # [B,H,L,S]
    dv = jnp.einsum("bhls,bhld->bhsd", p, g, precision=jax.lax.Precision.HIGHEST)
    dp = jnp.einsum("bhld,bhsd->bhls", g, v, precision=jax.lax.Precision.HIGHEST)
    # softmax backward: ds = p * (dp - sum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.einsum("bhls,bhsd->bhld", ds, k, precision=jax.lax.Precision.HIGHEST)
    dk = jnp.einsum("bhls,bhld->bhsd", ds, q, precision=jax.lax.Precision.HIGHEST)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


masked_attention_pallas.defvjp(_fwd, _bwd)
