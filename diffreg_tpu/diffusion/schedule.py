"""Diffusion schedules and forward process (matrix-space diffusion).

Re-implements the reference's cosine beta schedule and q_sample
(Diff-Reg-3dmatch/models/pipeline.py:82-112) plus the two branch-specific
noise models:

  * 3DMatch: signed-fractional noise scaled by 1.5, followed by nan->0 and
    a min-shift (pipeline.py:204-210);
  * 4DMatch: plain Gaussian noise, then sigmoid of the noised matrix
    (4dmatch pipeline.py:143-145).

Everything is precomputed into a ``DiffusionSchedule`` NamedTuple of device
arrays so the DDIM loop can index it inside ``lax.scan``.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def cosine_beta_schedule(timesteps: int = 1000, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule, computed in float64 on host."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def make_schedule(timesteps: int = 1000) -> DiffusionSchedule:
    betas = cosine_beta_schedule(timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
    )


def q_sample(schedule: DiffusionSchedule, x_start, t, noise):
    """Forward diffusion x_t = sqrt(acp_t) x_0 + sqrt(1-acp_t) eps.

    t: [B] int32 timesteps (broadcast over the trailing dims of x_start).
    """
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    a = schedule.sqrt_alphas_cumprod[t].reshape(shape)
    b = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * x_start + b * noise


def predict_noise_from_start(schedule: DiffusionSchedule, x_t, t, x0):
    """eps_hat = (sqrt(1/acp_t) x_t - x0) / sqrt(1/acp_t - 1) (pipeline.py:287-291)."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return (schedule.sqrt_recip_alphas_cumprod[t].reshape(shape) * x_t - x0) \
        / schedule.sqrt_recipm1_alphas_cumprod[t].reshape(shape)


def signed_fractional_noise(rng, shape, scale=1.5):
    """3DMatch training noise: sign(g) * frac(|g|) * scale (pipeline.py:205-206)."""
    g = jax.random.normal(rng, shape)
    return jnp.sign(g) * jnp.mod(jnp.abs(g), 1.0) * scale


def ddim_time_pairs(num_timesteps: int, sampling_steps: int) -> np.ndarray:
    """Reversed (t, t_next) pairs, matching pipeline.py:229-232.

    linspace(0, T-1, steps+1) as ints, reversed, consecutive pairs.
    """
    times = np.linspace(0, num_timesteps - 1, sampling_steps + 1).astype(np.int32)
    times = times[::-1]
    return np.stack([times[:-1], times[1:]], axis=1)  # [steps, 2]
