"""Weighted Kabsch / soft Procrustes — fully on-device, batched.

The reference extracts a pose from the soft matching matrix by taking the
top confidences as correspondence weights and solving weighted Procrustes
with an SVD **on host CPU in float64 every DDIM step**
(Diff-Reg-3dmatch/models/procrustes.py:35-36: "small SVD runs faster on cpu").
On TPU that host round-trip would serialize the whole reverse loop, so here
the 3x3 SVD is batched and stays on device; numerical robustness is handled
by a condition-number gate (identity fallback via ``jnp.where``, mirroring
procrustes.py:86-91) instead of try/except.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProcrustesResult(NamedTuple):
    rotation: jnp.ndarray        # [B, 3, 3] raw solution
    translation: jnp.ndarray     # [B, 3, 1]
    rotation_fwd: jnp.ndarray    # [B, 3, 3] gated solution (identity if rejected)
    translation_fwd: jnp.ndarray # [B, 3, 1]
    condition: jnp.ndarray       # [B] singular-value condition number
    solution_mask: jnp.ndarray   # [B] bool, True where solution accepted


def quaternion_to_matrix(q):
    """Unit quaternion [..., 4] (scalar first) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def _horn_rotation(b_mat):
    """Optimal proper rotation maximizing tr(R^T B), Davenport q-method.

    The reference solves the same problem with a host-CPU float64 SVD plus a
    determinant sign flip (procrustes.py:34-42); Horn's quaternion form is
    the TPU-friendly equivalent: a batched symmetric 4x4 eigh is accurate in
    f32 (the batched f32 SVD is not) and always yields det(R) = +1.
    """
    b11, b12, b13 = b_mat[..., 0, 0], b_mat[..., 0, 1], b_mat[..., 0, 2]
    b21, b22, b23 = b_mat[..., 1, 0], b_mat[..., 1, 1], b_mat[..., 1, 2]
    b31, b32, b33 = b_mat[..., 2, 0], b_mat[..., 2, 1], b_mat[..., 2, 2]
    sigma = b11 + b22 + b33
    k = jnp.stack(
        [
            sigma, b23 - b32, b31 - b13, b12 - b21,
            b23 - b32, b11 - b22 - b33, b12 + b21, b31 + b13,
            b31 - b13, b12 + b21, b22 - b11 - b33, b23 + b32,
            b12 - b21, b31 + b13, b23 + b32, b33 - b11 - b22,
        ],
        axis=-1,
    ).reshape(b_mat.shape[:-2] + (4, 4))
    _, vecs = jnp.linalg.eigh(k)  # ascending eigenvalues
    q = vecs[..., :, -1]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # this K convention yields R^T of the map we want (y ~ R x); transpose back
    return jnp.swapaxes(quaternion_to_matrix(q), -1, -2)


def weighted_kabsch(x, y, w, eps=1e-4):
    """Weighted rigid alignment x -> y (Wahba/Procrustes, no scale).

    Args:
      x: [B, N, 3] source points.
      y: [B, N, 3] target points.
      w: [B, N, 1] non-negative weights.

    Returns:
      (R [B,3,3], t [B,3,1], condition [B]).

    Same optimum as reference procrustes.py:17-44 (weighted Kabsch with
    determinant correction == optimal proper rotation), solved via Horn's
    quaternion method for on-device f32 robustness. The condition number is
    the singular-value ratio of the cross-covariance, obtained from a 3x3
    symmetric eigh.
    """
    w1 = jnp.sum(jnp.abs(w), axis=1, keepdims=True)
    wn = w / (w1 + eps)
    mean_x = jnp.sum(wn * x, axis=1, keepdims=True)  # [B, 1, 3]
    mean_y = jnp.sum(wn * y, axis=1, keepdims=True)
    sxy = jnp.matmul(
        jnp.swapaxes(y - mean_y, 1, 2), wn * (x - mean_x),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 3, 3] — f32 accumulation: the pose solve is precision-critical

    r = _horn_rotation(sxy)

    # singular values of Sxy from eigh(Sxy^T Sxy) — for the condition gate.
    # Degenerate covariance (smallest singular value 0) must produce a
    # condition that FAILS the `condition < max_condition_num` gate, matching
    # the reference where 0/0 -> nan and x/0 -> inf both reject
    # (procrustes.py:37,87).
    evals = jnp.linalg.eigvalsh(jnp.swapaxes(sxy, 1, 2) @ sxy)  # ascending
    d = jnp.sqrt(jnp.clip(evals, 0.0, None))
    condition = jnp.where(d[:, 0] > 0.0, d[:, -1] / jnp.where(d[:, 0] > 0.0, d[:, 0], 1.0), jnp.inf)

    t = jnp.swapaxes(mean_y, 1, 2) - r @ jnp.swapaxes(mean_x, 1, 2)
    return r, t, condition


def soft_procrustes(
    conf_matrix,
    src_pcd,
    tgt_pcd,
    src_mask,
    tgt_mask,
    *,
    sample_rate=1.0,
    max_condition_num=0.0,
    use_masked_lengths=False,
):
    """Pose from a soft matching matrix via top-confidence weighted Kabsch.

    Mirrors reference SoftProcrustesLayer.forward (procrustes.py:48-93):
    flatten [N, M] confidences, keep the top ``sample_rate * max(len_src,
    len_tgt)`` entries as weighted correspondences, solve weighted Kabsch,
    gate by condition number. The 3dmatch branch derives lengths from the
    padded sizes (procrustes.py:61-62); the 4dmatch branch from the mask sums
    — selected by ``use_masked_lengths``.

    Static-shape version: always takes a static top-k of size
    ``ceil(sample_rate * max(N, M))`` and zeroes weights beyond the dynamic
    per-pair budget, which is exactly the reference's ``w_mask`` trick.
    """
    b, n, m = conf_matrix.shape
    k = int(max(1, round(sample_rate * max(n, m))))

    if use_masked_lengths:
        src_len = src_mask.sum(axis=1).astype(conf_matrix.dtype)
        tgt_len = tgt_mask.sum(axis=1).astype(conf_matrix.dtype)
    else:
        src_len = jnp.full((b,), float(n), conf_matrix.dtype)
        tgt_len = jnp.full((b,), float(m), conf_matrix.dtype)
    entry_max = jnp.floor(jnp.maximum(src_len, tgt_len) * sample_rate).astype(jnp.int32)

    flat = conf_matrix.reshape(b, n * m)
    from ..ops.topk import fast_top_k

    w, idx = fast_top_k(flat, k)  # [B, k] (approx on TPU; ops/topk.py)
    idx_src = idx // m
    idx_tgt = idx % m

    take = jax.vmap(lambda pts, i: pts[i])
    src_sampled = take(src_pcd, idx_src)  # [B, k, 3]
    tgt_sampled = take(tgt_pcd, idx_tgt)

    w_mask = jnp.arange(k)[None, :] < entry_max[:, None]
    w = jnp.where(w_mask, w, 0.0)

    r, t, condition = weighted_kabsch(src_sampled, tgt_sampled, w[..., None])

    # Replace non-finite solutions with identity (reference try/except fallback,
    # procrustes.py:79-84).
    finite = jnp.all(jnp.isfinite(r), axis=(1, 2)) & jnp.all(jnp.isfinite(t), axis=(1, 2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=conf_matrix.dtype), (b, 3, 3))
    zero = jnp.zeros((b, 3, 1), conf_matrix.dtype)
    r = jnp.where(finite[:, None, None], r, eye)
    t = jnp.where(finite[:, None, None], t, zero)
    condition = jnp.where(finite, condition, 0.0)

    # Condition-number gate (procrustes.py:86-91). NOTE reference behavior:
    # with max_condition_num == 0 (3dmatch test config) the gate rejects every
    # solution, so the *forward* warp is always identity while the raw (R, t)
    # is still reported.
    solution_mask = condition < max_condition_num
    r_fwd = jnp.where(solution_mask[:, None, None], r, eye)
    t_fwd = jnp.where(solution_mask[:, None, None], t, zero)

    return ProcrustesResult(r, t, r_fwd, t_fwd, condition, solution_mask)
