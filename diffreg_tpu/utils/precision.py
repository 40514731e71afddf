"""Matmul precision policy.

JAX's default matmul precision on TPU (and its CPU emulation) accumulates in
bfloat16, which costs ~3 decimal digits on f32 inputs. The reference runs
full-f32 torch matmuls, and several pieces of this pipeline are numerically
fragile (Sinkhorn logits, the 3x3 cross-covariance feeding the pose solve,
KPConv influence contractions), so the framework pins those contractions to
``Precision.HIGHEST`` by default.

The policy is global and settable from config (``precision: default|highest``)
so throughput experiments can trade accuracy back for MXU passes on the big
attention matmuls.
"""
from __future__ import annotations

import jax

_PRECISION = jax.lax.Precision.HIGHEST


def set_precision(name: str) -> None:
    global _PRECISION
    _PRECISION = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def get_precision():
    return _PRECISION


def einsum(subscripts, *operands):
    """jnp.einsum under the framework precision policy."""
    import jax.numpy as jnp

    return jnp.einsum(subscripts, *operands, precision=_PRECISION)


def matmul(a, b):
    import jax.numpy as jnp

    return jnp.matmul(a, b, precision=_PRECISION)
