"""NeRF-style rendering ops: CDF bin sampling + volumetric compositing.

Twins of vision3d/ops/{sample_pdf,volume_render}.py (the URR model family's
rendering utilities). ``sample_pdf`` uses ``jnp.searchsorted`` over the CDF
exactly like the reference's torch.searchsorted path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_pdf(rng, locations, weights, num_samples: int,
               deterministic: bool = False, eps: float = 1e-5):
    """Inverse-CDF sampling from weighted bins (sample_pdf.py:6-59).

    locations [N, B+1] bin boundaries, weights [N, B]. ``rng`` may be None
    when deterministic.
    """
    n, b = weights.shape
    w = weights + eps
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B+1]

    if deterministic:
        t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_samples,
                                          dtype=weights.dtype), (n, num_samples))
    else:
        t = jax.random.uniform(rng, (n, num_samples), dtype=weights.dtype)

    idx = jax.vmap(lambda c, tv: jnp.searchsorted(c, tv, side="right"))(
        jax.lax.stop_gradient(cdf), t)
    lo = jnp.maximum(idx - 1, 0)
    hi = jnp.minimum(idx, b)

    cdf_lo = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, hi, axis=-1)
    loc_lo = jnp.take_along_axis(locations, lo, axis=-1)
    loc_hi = jnp.take_along_axis(locations, hi, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    frac = (t - cdf_lo) / denom
    return loc_lo + frac * (loc_hi - loc_lo)


def volume_render(ray_directions, z_values, point_sigmas,
                  point_colors: Optional[jnp.ndarray] = None,
                  sigma_noise: Optional[float] = None, rng=None,
                  opacity_only: bool = False, white_background: bool = False,
                  deterministic: bool = False, eps: float = 1e-10):
    """Volumetric compositing along rays (volume_render.py:8-74).

    ray_directions [N, 3], z_values [N, M], point_sigmas [N, M],
    point_colors optional [N, M, 3]. Returns (colors, depths, opacities) /
    (depths, opacities) / opacities like the reference.
    """
    deltas = z_values[..., 1:] - z_values[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
    deltas = deltas * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    if (not deterministic) and sigma_noise is not None and sigma_noise > 0.0:
        point_sigmas = point_sigmas + sigma_noise * jax.random.normal(
            rng, point_sigmas.shape, point_sigmas.dtype)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(point_sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + eps], axis=-1)
    opacities = alphas * jnp.cumprod(shifted, axis=-1)[..., :-1]
    if opacity_only:
        return opacities

    ray_opacity = opacities.sum(axis=-1)
    depths = jnp.sum(opacities * z_values, axis=-1)
    if point_colors is not None:
        colors = jnp.sum(opacities[..., None] * point_colors, axis=-2)
        if white_background:
            colors = colors + 1.0 - ray_opacity[..., None]
        return colors, depths, opacities
    return depths, opacities
