"""Batch <-> pack layout conversion (vision3d/ops/conversion.py twins).

JAX/XLA needs static output shapes, so the pack capacity is explicit:
``batch_to_pack`` packs valid rows to the FRONT of a fixed-size buffer
(capacity = B*N by default) instead of the reference's ragged output, and
``pack_to_batch`` takes a static ``max_length``. Round-trips are exact for
the valid region; everything is jittable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def batch_to_pack(batch_tensor, masks=None, capacity: Optional[int] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, N, C] (+ masks [B, N]) -> (packed [M, C], lengths [B],
    pack_valid [M]) with M = capacity (default B*N). Valid rows appear
    first, in batch-major order, exactly like the reference's boolean
    indexing (conversion.py:36-54); the tail is zero-padded."""
    b, n = batch_tensor.shape[:2]
    m = capacity or b * n
    flat = batch_tensor.reshape((b * n,) + batch_tensor.shape[2:])
    if masks is None:
        lengths = jnp.full((b,), n, jnp.int32)
        valid = jnp.ones((b * n,), bool)
    else:
        lengths = masks.sum(axis=1).astype(jnp.int32)
        valid = masks.reshape(-1)
    # stable order: sort by (invalid, original index)
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)[:m]
    packed = flat[order]
    pack_valid = valid[order]
    packed = jnp.where(
        pack_valid.reshape((-1,) + (1,) * (packed.ndim - 1)), packed, 0)
    return packed, lengths, pack_valid


def pack_to_batch(pack_tensor, lengths, max_length: int, fill_value=0.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(packed [M, C], lengths [B]) -> ([B, max_length, C], masks
    [B, max_length]) (conversion.py:56-90). Rows beyond each sample's
    length are filled with ``fill_value``."""
    b = lengths.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, lengths.dtype),
                              jnp.cumsum(lengths)[:-1]])
    col = jnp.arange(max_length)
    masks = col[None, :] < lengths[:, None]
    src = starts[:, None] + col[None, :]
    src = jnp.clip(src, 0, pack_tensor.shape[0] - 1)
    batch = pack_tensor[src.reshape(-1)].reshape(
        (b, max_length) + pack_tensor.shape[1:])
    fill = jnp.asarray(fill_value, batch.dtype)
    batch = jnp.where(masks.reshape(b, max_length, *([1] * (batch.ndim - 2))),
                      batch, fill)
    return batch, masks
