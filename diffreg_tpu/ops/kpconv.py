"""Kernel-point convolution primitive — static-shape, gather + MXU einsum.

Functional core of KPConv (reference Diff-Reg-3dmatch/models/blocks.py:214-359),
restructured for TPU:
  * neighborhoods are fixed-K, sentinel-padded (index == Ns means "shadow
    point"), so the gather is a single XLA `take` against an array with one
    appended shadow row — identical to the reference's explicit fake-point
    concat (blocks.py:253-254, 332-333);
  * influence weights and the per-kernel-point contraction are one fused
    einsum chain that XLA maps onto the MXU; nothing is data-dependent.

Kernel point dispositions come from diffreg_tpu.ops.kernel_points.
"""
from __future__ import annotations

import jax.numpy as jnp


def kpconv(
    q_pts,
    s_pts,
    neighb_inds,
    x,
    kernel_points,
    weights,
    kp_extent,
    influence="linear",
    aggregation="sum",
):
    """Apply one kernel-point convolution.

    Args:
      q_pts:        [Nq, 3] query points (padded rows anywhere).
      s_pts:        [Ns, 3] support points.
      neighb_inds:  [Nq, K] int32 indices into s_pts, sentinel == Ns.
      x:            [Ns, Cin] support features (padded rows must be 0).
      kernel_points:[P, 3] kernel dispositions (radius-scaled).
      weights:      [P, Cin, Cout] kernel weights.
      kp_extent:    influence distance of a kernel point.

    Returns:
      [Nq, Cout] features.
    """
    ns = s_pts.shape[0]

    shadow_pts = jnp.concatenate([s_pts, jnp.full((1, 3), 1.0e6, s_pts.dtype)], axis=0)
    shadow_x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)

    neighbors = shadow_pts[neighb_inds] - q_pts[:, None, :]          # [Nq, K, 3]
    # ||n - kp||^2 = ||n||^2 + ||kp||^2 - 2 n.kp — the cross term is one MXU
    # matmul; avoids materializing the [Nq, K, P, 3] difference tensor whose
    # HBM traffic dominates the whole backbone at 3DMatch scale.
    import jax

    n2 = jnp.sum(neighbors * neighbors, axis=-1, keepdims=True)      # [Nq, K, 1]
    k2 = jnp.sum(kernel_points * kernel_points, axis=-1)             # [P]
    cross = jnp.einsum("nkc,pc->nkp", neighbors, kernel_points,
                       precision=jax.lax.Precision.HIGHEST)
    sq_d = jnp.clip(n2 + k2[None, None, :] - 2.0 * cross, 0.0, None)  # [Nq, K, P]

    if influence == "linear":
        all_w = jnp.clip(1.0 - jnp.sqrt(sq_d) / kp_extent, 0.0, None)
    elif influence == "constant":
        all_w = jnp.ones_like(sq_d)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_w = jnp.exp(-sq_d / (2.0 * sigma**2 + 1e-9))
    else:
        raise ValueError(influence)

    if aggregation == "closest":
        closest = jnp.argmin(sq_d, axis=2)
        all_w = all_w * jax_one_hot(closest, kernel_points.shape[0], all_w.dtype)
    elif aggregation != "sum":
        raise ValueError(aggregation)

    neighb_x = shadow_x[neighb_inds]                                  # [Nq, K, Cin]

    # [Nq, K, P] x [Nq, K, Cin] -> [Nq, P, Cin] -> (MXU) [Nq, Cout]
    # f32 accumulation (framework precision policy): bf16 accumulation costs
    # ~3 digits which compounds across the 11-block pyramid.
    from ..utils.precision import get_precision

    weighted = jnp.einsum("nkp,nkc->npc", all_w, neighb_x, precision=get_precision())
    out = jnp.einsum("npc,pcd->nd", weighted, weights, precision=get_precision())

    # Density normalization — reference counts neighbors whose feature-sum is
    # positive (blocks.py:354-357). Preserved verbatim: this is a *feature*
    # test, not a validity test (a real neighbor with non-positive feature sum
    # is excluded) — documented reference behavior.
    neighbor_num = jnp.sum(jnp.sum(neighb_x, axis=-1) > 0.0, axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1)
    return out / neighbor_num[:, None].astype(out.dtype)


def jax_one_hot(idx, num, dtype):
    import jax

    return jax.nn.one_hot(idx, num, dtype=dtype)


def max_pool(x, inds):
    """Max over sentinel-padded neighborhoods (reference blocks.py:71-87).

    x: [Ns, C]; inds: [Nq, K] sentinel == Ns. Shadow rows contribute 0
    (reference appends a zero row before max), so all-shadow rows give 0.
    """
    shadow_x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return jnp.max(shadow_x[inds], axis=1)


def closest_pool(x, inds):
    """Copy the feature of the nearest (first) neighbor (blocks.py:56-68)."""
    shadow_x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return shadow_x[inds[:, 0]]
