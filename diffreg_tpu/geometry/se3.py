"""SE(3) helpers (batched, jittable)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_transform(points, rotation, translation):
    """R @ p + t.

    Args:
      points:      [..., N, 3]
      rotation:    [..., 3, 3]
      translation: [..., 3] or [..., 3, 1]
    """
    t = translation
    if t.shape[-1] == 1 and t.ndim == rotation.ndim:
        t = t[..., 0]
    return points @ jnp.swapaxes(rotation, -1, -2) + t[..., None, :]


def compose(r1, t1, r2, t2):
    """Transform equivalent to applying (r2, t2) after (r1, t1); t are [..., 3, 1]."""
    return r2 @ r1, r2 @ t1 + t2


def inverse(rotation, translation):
    """Inverse transform; translation is [..., 3, 1]."""
    rt = jnp.swapaxes(rotation, -1, -2)
    return rt, -(rt @ translation)


def rotation_error_deg(r_est, r_gt):
    """Isotropic rotation error in degrees (RRE).

    The trace is contracted at HIGHEST precision: with the default bf16
    matmul accumulation an *exact* match reads as ~2 degrees of error
    (arccos is maximally sensitive near 1).
    """
    trace = jnp.einsum("...ij,...ij->...", r_est, r_gt,
                       precision=jax.lax.Precision.HIGHEST)
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_est, t_gt):
    """Euclidean translation error (RTE); t are [..., 3] or [..., 3, 1]."""
    d = t_est - t_gt
    if d.shape[-1] == 1:
        d = d[..., 0]
    return jnp.linalg.norm(d, axis=-1)
