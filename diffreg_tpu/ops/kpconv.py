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
    compute_dtype=None,
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
    neighbors, neighb_feats = _gather_pos_feats(
        q_pts, s_pts, neighb_inds, x, compute_dtype)
    # ||n - kp||^2 = ||n||^2 + ||kp||^2 - 2 n.kp — the cross term is one MXU
    # matmul; avoids materializing the [Nq, K, P, 3] difference tensor whose
    # HBM traffic dominates the whole backbone at 3DMatch scale.
    import jax

    n2 = jnp.sum(neighbors * neighbors, axis=-1, keepdims=True)      # [Nq, K, 1]
    k2 = jnp.sum(kernel_points * kernel_points, axis=-1)             # [P]
    cross = jnp.einsum("nkc,pc->nkp", neighbors, kernel_points,
                       precision=jax.lax.Precision.HIGHEST)
    sq_d = jnp.clip(n2 + k2[None, None, :] - 2.0 * cross, 0.0, None)  # [Nq, K, P]

    all_w = _influence_weights(sq_d, kp_extent, influence, aggregation,
                               kernel_points.shape[0])

    neighb_x = neighb_feats                                           # [Nq, K, Cin]

    # [Nq, K, P] x [Nq, K, Cin] -> [Nq, P, Cin] -> (MXU) [Nq, Cout]
    # f32 accumulation (framework precision policy): bf16 accumulation costs
    # ~3 digits which compounds across the 11-block pyramid.
    from ..utils.precision import get_precision

    if compute_dtype is not None:
        weighted = jnp.einsum("nkp,nkc->npc", all_w.astype(compute_dtype),
                              neighb_x, preferred_element_type=jnp.float32)
        out = jnp.einsum("npc,pcd->nd", weighted.astype(compute_dtype),
                         weights.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        weighted = jnp.einsum("nkp,nkc->npc", all_w, neighb_x,
                              precision=get_precision())
        out = jnp.einsum("npc,pcd->nd", weighted, weights,
                         precision=get_precision())

    # Density normalization — reference counts neighbors whose feature-sum is
    # positive (blocks.py:354-357). Preserved verbatim: this is a *feature*
    # test, not a validity test (a real neighbor with non-positive feature sum
    # is excluded) — documented reference behavior.
    neighbor_num = jnp.sum(jnp.sum(neighb_x.astype(jnp.float32), axis=-1) > 0.0,
                           axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1)
    return out / neighbor_num[:, None].astype(out.dtype)


def jax_one_hot(idx, num, dtype):
    import jax

    return jax.nn.one_hot(idx, num, dtype=dtype)


def _gather_pos_feats(q_pts, s_pts, neighb_inds, x, compute_dtype):
    """ONE fused gather of [positions ++ features] rows.

    Separate gathers of the [Nq, K, 3] positions and [Nq, K, Cin] features
    cost ~3.2x more on this TPU generation: XLA's gather is
    per-row-latency-bound, and the 12-byte position rows are pathological
    (measured 2026-08: pts-only gather 1.74 s vs fused 0.69 s at B16 N8704
    K34 C64). Returns (centered neighbor positions [Nq, K, 3] in the source
    dtype, neighbor features [Nq, K, Cin]).
    """
    s_pts_pad = jnp.concatenate([s_pts, jnp.full((1, 3), 1.0e6, s_pts.dtype)], axis=0)
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    if compute_dtype is not None:
        # bf16 gather + contraction inputs (f32 accumulation downstream):
        # the conv is gather-traffic-bound, so halving the bytes buys ~1.3x.
        # Positions CANNOT be plain bf16 (1.2 cm error at metre scale vs
        # ~6 cm influence extents), so they ride as a hi/lo bf16 split
        # reconstructed in f32 after the gather (error ~5e-5).
        hi = s_pts_pad.astype(compute_dtype)
        lo = (s_pts_pad - hi.astype(s_pts.dtype)).astype(compute_dtype)
        table = jnp.concatenate([hi, lo, x_pad.astype(compute_dtype)], axis=-1)
        gathered = table[neighb_inds]                # [Nq, K, 6+Cin]
        neighbors = (gathered[..., :3].astype(s_pts.dtype)
                     + gathered[..., 3:6].astype(s_pts.dtype)) - q_pts[:, None, :]
        neighb_feats = gathered[..., 6:]
    else:
        table = jnp.concatenate([s_pts_pad, x_pad], axis=-1)  # [Ns+1, 3+Cin]
        gathered = table[neighb_inds]                # [Nq, K, 3+Cin]
        neighbors = gathered[..., :3] - q_pts[:, None, :]
        neighb_feats = gathered[..., 3:]
    return neighbors, neighb_feats


def _influence_weights(sq_d, kp_extent, influence, aggregation, num_kp):
    """Kernel-point influence weights [Nq, K, P] (blocks.py:305-331)."""
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
        all_w = all_w * jax_one_hot(closest, num_kp, all_w.dtype)
    elif aggregation != "sum":
        raise ValueError(aggregation)
    return all_w


def kpconv_deformable(
    q_pts,
    s_pts,
    neighb_inds,
    x,
    kernel_points,
    weights,
    offset_weights,
    offset_bias,
    kp_extent,
    influence="linear",
    aggregation="sum",
    modulated=False,
    compute_dtype=None,
    offset_kernel_points=None,
):
    """Deformable (optionally modulated) kernel-point convolution.

    Twin of the reference's ``KPConv(deformable=True)`` branch
    (Diff-Reg-3dmatch/models/blocks.py:124-260, 276-345), restructured for
    TPU static shapes:

      * a rigid KPConv over the same neighborhood predicts per-query kernel
        offsets (+ sigmoid modulations when ``modulated``), exactly the
        reference's ``offset_conv`` + ``offset_bias`` (blocks.py:164-178,
        216-241);
      * the reference then *dynamically re-gathers* only neighbors in range
        of a deformed kernel point (blocks.py:276-303) — a data-dependent
        shape. Here the same semantics are a static mask: out-of-range
        neighbors have their features zeroed (== pointed at the shadow row),
        so they contribute nothing to the weighted sum OR the density count.
        Influence weights of masked rows multiply zero features, matching
        the reference's gathered-but-shadowed rows bit for bit;
      * per-query deformed kernel points break the shared ||n-kp||^2 matmul
        trick, so the cross term is a batched [K,3]x[3,P] einsum per query —
        still MXU-shaped, no [Nq,K,P,3] materialization.

    Returns ``(features [Nq, Cout], aux)`` where ``aux`` carries
    ``min_d2`` [Nq, P], ``deformed_kp`` [Nq, P, 3], ``offset_features``
    [Nq, offset_dim] — the running variables the reference stores on the
    module for the deformation regularizer (blocks.py:154-157, 280-281).
    """
    import jax

    p = kernel_points.shape[0]

    # Offset generation (blocks.py:216-241): rigid KPConv -> offsets. The
    # reference's offset_conv is a separate KPConv instance whose kernel
    # dispositions carry their OWN random rotation (blocks.py:164-177,
    # kernel_points.py load_kernels) — hence the separate
    # ``offset_kernel_points`` (defaults to sharing the main dispositions).
    okp = kernel_points if offset_kernel_points is None else offset_kernel_points
    offset_features = kpconv(
        q_pts, s_pts, neighb_inds, x, okp, offset_weights,
        kp_extent, influence, aggregation, compute_dtype) + offset_bias
    if modulated:
        unscaled = offset_features[:, :3 * p].reshape(-1, p, 3)
        modulations = 2.0 * jax.nn.sigmoid(offset_features[:, 3 * p:])
    else:
        unscaled = offset_features.reshape(-1, p, 3)
        modulations = None
    offsets = unscaled * kp_extent                       # blocks.py:241
    deformed_kp = kernel_points[None, :, :] + offsets    # [Nq, P, 3]

    neighbors, neighb_x = _gather_pos_feats(
        q_pts, s_pts, neighb_inds, x, compute_dtype)
    neighbors = neighbors.astype(s_pts.dtype)

    n2 = jnp.sum(neighbors * neighbors, axis=-1, keepdims=True)   # [Nq, K, 1]
    k2 = jnp.sum(deformed_kp * deformed_kp, axis=-1)              # [Nq, P]
    cross = jnp.einsum("nkc,npc->nkp", neighbors, deformed_kp,
                       precision=jax.lax.Precision.HIGHEST)
    sq_d = jnp.clip(n2 + k2[:, None, :] - 2.0 * cross, 0.0, None)  # [Nq, K, P]

    # running variable for the fitting regularizer (blocks.py:280-281)
    min_d2 = jnp.min(sq_d, axis=1)                                 # [Nq, P]

    # static twin of the in-range re-gather (blocks.py:283-303): neighbors
    # outside every deformed kernel point's extent become shadow rows
    in_range = jnp.any(sq_d < kp_extent**2, axis=2)                # [Nq, K]
    neighb_x = neighb_x * in_range[..., None].astype(neighb_x.dtype)

    all_w = _influence_weights(sq_d, kp_extent, influence, aggregation, p)

    from ..utils.precision import get_precision

    if compute_dtype is not None:
        weighted = jnp.einsum("nkp,nkc->npc", all_w.astype(compute_dtype),
                              neighb_x, preferred_element_type=jnp.float32)
    else:
        weighted = jnp.einsum("nkp,nkc->npc", all_w, neighb_x,
                              precision=get_precision())
    if modulated:
        weighted = weighted * modulations[:, :, None].astype(weighted.dtype)
    if compute_dtype is not None:
        out = jnp.einsum("npc,pcd->nd", weighted.astype(compute_dtype),
                         weights.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("npc,pcd->nd", weighted, weights,
                         precision=get_precision())

    # density normalization over the FILTERED neighbors (blocks.py:352-357)
    neighbor_num = jnp.sum(jnp.sum(neighb_x.astype(jnp.float32), axis=-1) > 0.0,
                           axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1)
    out = out / neighbor_num[:, None].astype(out.dtype)
    aux = {"min_d2": min_d2, "deformed_kp": deformed_kp,
           "offset_features": offset_features}
    return out, aux


def kpconv_batched(
    q_pts,          # [B, Nq, 3]
    s_pts,          # [B, Ns, 3]
    neighb_inds,    # [B, Nq, K]
    x,              # [B, Ns, Cin]
    kernel_points,  # [P, 3]
    weights,        # [P, Cin, Cout]
    kp_extent,
    influence="linear",
    aggregation="sum",
    use_pallas=False,
    compute_dtype=None,
):
    """Batched KPConv: XLA path (default) or the fused Pallas kernel.

    The Pallas kernel (ops/pallas/kpconv_kernel.py) fuses everything after
    the neighbor-row gather and is parity-tested on real TPU, but measured
    SLOWER than the XLA formulation on v5e (the influence x feature
    expansion is VMEM-RMW-bound either way and XLA's pipelining wins), so
    it is opt-in. ``compute_dtype=bfloat16`` halves the gather +
    contraction traffic with f32 accumulation — the effective lever on
    this hardware (~1.3x per conv).
    """
    import jax

    b, nq, k = neighb_inds.shape
    p, cin, cout = weights.shape

    from .pallas.kpconv_kernel import fused_kpconv, pick_tile

    tile_q = pick_tile(nq, k, cin + 3, p, cin)
    # weights must also fit VMEM alongside the streamed blocks
    fits = (p * cin * cout * 4) <= 4 * 2**20
    if not (use_pallas and influence == "linear" and aggregation == "sum"
            and tile_q and fits):
        conv = jax.vmap(kpconv,
                        in_axes=(0, 0, 0, 0, None, None, None, None, None, None))
        return conv(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
                    kp_extent, influence, aggregation, compute_dtype)

    table = jnp.concatenate(
        [jnp.concatenate([s_pts, jnp.full((b, 1, 3), 1.0e6, s_pts.dtype)], axis=1),
         jnp.concatenate([x, jnp.zeros((b, 1, x.shape[-1]), x.dtype)], axis=1)],
        axis=-1)
    # K-major layout: the kernel streams (1, 1, TILE_Q, 3+C) blocks
    inds_km = jnp.swapaxes(neighb_inds, 1, 2)                   # [B, K, Nq]
    gathered = jax.vmap(lambda t, i: t[i])(table, inds_km)      # [B, K, Nq, 3+C]
    return fused_kpconv(gathered, q_pts, kernel_points, weights,
                        float(kp_extent), tile_q)


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
