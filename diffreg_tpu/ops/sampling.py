"""Point sampling ops: farthest point sampling, random choice.

Parity with the reference's CUDA pointops (Diff-Reg-3dmatch/pointops/src/
sampling_cuda_kernel.cu — dead code on the live path, SURVEY §2.1) and
vision3d's fps/random samplers. FPS is a ``lax.fori_loop`` over the static
sample count: each step is one masked distance update + argmax, which is
exactly the parallel part the CUDA kernel exploits.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(points, valid, num_samples):
    """FPS over a padded cloud.

    Args:
      points: [N, 3]; valid: [N] bool.
      num_samples: static sample count.

    Returns:
      indices [num_samples] int32 (repeats the first index if the cloud has
      fewer valid points), mask [num_samples] bool.
    """
    n = points.shape[0]
    big = 1.0e10
    d = jnp.where(valid, big, -1.0)   # invalid points never selected
    first = jnp.argmax(valid)          # first valid index

    def body(i, state):
        dists, idxs = state
        last = points[idxs[i - 1]]
        nd = jnp.sum((points - last) ** 2, axis=1)
        dists = jnp.minimum(dists, jnp.where(valid, nd, -1.0))
        idxs = idxs.at[i].set(jnp.argmax(dists).astype(jnp.int32))
        return dists, idxs

    idxs0 = jnp.zeros(num_samples, jnp.int32).at[0].set(first.astype(jnp.int32))
    dists0 = d
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dists0, idxs0))
    n_valid = valid.sum()
    mask = jnp.arange(num_samples) < n_valid
    return jnp.where(mask, idxs, idxs[0]), mask


def random_choice(rng, n, num_samples, valid=None):
    """Uniform random indices over the valid prefix/subset."""
    if valid is None:
        return jax.random.randint(rng, (num_samples,), 0, n)
    n_valid = jnp.maximum(valid.sum(), 1)
    u = jax.random.uniform(rng, (num_samples,))
    ranks = (u * n_valid).astype(jnp.int32)
    order = jnp.argsort(~valid)  # valid indices first
    return order[jnp.clip(ranks, 0, n - 1)]
