"""Correspondence-based RANSAC — fully on-device, all hypotheses in parallel.

Replaces Open3D's ``registration_ransac_based_on_correspondence`` (reference
models/loss.py:13-24: 50k sequential iterations on host CPU per pair). On
TPU all hypotheses are evaluated at once: sample 3-point minimal sets from
the correspondence list, solve Horn per hypothesis (batched), count inliers,
pick the best, then refine with weighted Kabsch on the inlier set.

This is the pairs/sec path; metric parity with the reference's RANSAC is at
the *metric* level (the reference itself averages 3 runs because its RANSAC
is nondeterministic, lib/tester.py:19-25).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.procrustes import weighted_kabsch


def _three_point_pose(s3, t3, eps=1e-12, degenerate_tol=1e-5):
    """Rigid pose from 3-point minimal sets [H, 3, 3] via frame alignment.

    Returns (R, t, ok): ok is False for degenerate samples (duplicated or
    collinear points on either side). Degenerates yield non-orthonormal R,
    which MUST be rejected before the matmul inlier scoring — that identity
    assumes R^T R = I, and a rank-deficient R silently underestimates
    distances, manufacturing fake inliers.
    """
    def frame(p):
        u1 = p[:, 1] - p[:, 0]
        u2 = p[:, 2] - p[:, 0]
        n1 = jnp.linalg.norm(u1, axis=1, keepdims=True)
        e1 = u1 / jnp.clip(n1, eps, None)
        u2p = u2 - jnp.sum(u2 * e1, axis=1, keepdims=True) * e1
        n2 = jnp.linalg.norm(u2p, axis=1, keepdims=True)
        e2 = u2p / jnp.clip(n2, eps, None)
        e3 = jnp.cross(e1, e2)
        ok = (n1[:, 0] > degenerate_tol) & (n2[:, 0] > degenerate_tol)
        return jnp.stack([e1, e2, e3], axis=2), ok  # columns

    fs, ok_s = frame(s3)
    ft, ok_t = frame(t3)
    r = ft @ jnp.swapaxes(fs, 1, 2)
    cs = s3.mean(axis=1, keepdims=True)
    ct = t3.mean(axis=1, keepdims=True)
    t = jnp.swapaxes(ct, 1, 2) - r @ jnp.swapaxes(cs, 1, 2)
    return r, t, ok_s & ok_t


class RansacResult(NamedTuple):
    rotation: jnp.ndarray      # [3, 3]
    translation: jnp.ndarray   # [3, 1]
    inlier_count: jnp.ndarray  # scalar int
    best_fraction: jnp.ndarray # inliers / valid corrs


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters",
                                             "hypothesis_chunk"))
def ransac_pose(
    rng,
    src_corr,          # [C, 3] source points of correspondences (padded)
    tgt_corr,          # [C, 3] target points
    corr_valid,        # [C] bool
    distance_threshold=0.05,
    num_hypotheses=16384,
    refine_iters=2,
    hypothesis_chunk=16384,
):
    """RANSAC from correspondences for ONE pair. vmap over pairs as needed."""
    c = src_corr.shape[0]
    n_valid = jnp.maximum(corr_valid.sum(), 1)

    # --- sample 3 distinct-ish correspondence indices per hypothesis ---
    u = jax.random.uniform(rng, (num_hypotheses, 3))
    idx = jnp.clip((u * n_valid).astype(jnp.int32), 0, c - 1)
    # corr arrays are score-sorted with valid entries first, so indices
    # [0, n_valid) hit exactly the valid set.
    s3 = src_corr[idx]                                          # [H, 3, 3]
    t3 = tgt_corr[idx]

    # Minimal-set pose via orthonormal-frame alignment: for 3 exact
    # correspondences R = F_tgt @ F_src^T — pure cross products, no eigh.
    # (The optimal-weighted solve stays for the refinement steps below;
    # hypothesis generation doesn't need least-squares optimality.)
    r_h, t_h, ok_h = _three_point_pose(s3, t3)

    # --- inlier counting for all hypotheses as ONE MXU matmul ---
    # ||R s + t - t'||^2 = (||s||^2 + ||t'||^2) + ||t||^2
    #                      + 2 <R^T t, s> - 2 <t, t'> - 2 <vec(R), vec(t' s^T)>
    # so d2[h, c] = W[h, :] @ G[:, c] with 17 static features — avoids the
    # [H, C, 3] intermediate (HBM-bound) entirely.
    c_pts = src_corr.shape[0]
    g = jnp.concatenate([
        jnp.ones((c_pts, 1)),
        (jnp.sum(src_corr**2, 1) + jnp.sum(tgt_corr**2, 1))[:, None],
        src_corr,                                        # <R^T t, s>
        tgt_corr,                                        # -2 <t, t'>
        (tgt_corr[:, :, None] * src_corr[:, None, :]).reshape(c_pts, 9),
    ], axis=1)                                           # [C, 17]
    t_flat = t_h[:, :, 0]
    rt_t = jnp.einsum("hij,hi->hj", r_h, t_flat)          # R^T t
    w = jnp.concatenate([
        jnp.sum(t_flat**2, 1)[:, None],
        jnp.ones((num_hypotheses, 1)),
        2.0 * rt_t,
        -2.0 * t_flat,
        -2.0 * r_h.reshape(num_hypotheses, 9),
    ], axis=1)                                           # [H, 17]
    # The [H, C] distance matrix is the only O(H*C) intermediate (65536 x
    # 1024 f32 = 256 MB per vmapped pair) — score hypotheses in chunks so
    # peak memory is bounded by hypothesis_chunk regardless of the budget.
    # A single chunk (the bench path, H=8192) lowers to exactly the old
    # one-matmul program.
    def _count(w_chunk, ok_chunk):
        d2 = jnp.matmul(w_chunk, g.T,
                        precision=jax.lax.Precision.HIGHEST)     # [h, C]
        inl = (d2 < distance_threshold**2) & corr_valid[None]
        return jnp.where(ok_chunk, inl.sum(axis=1), -1)          # [h]

    if num_hypotheses <= hypothesis_chunk:
        counts = _count(w, ok_h)                                 # [H]
    else:
        n_chunks = -(-num_hypotheses // hypothesis_chunk)
        pad = n_chunks * hypothesis_chunk - num_hypotheses
        w_p = jnp.pad(w, ((0, pad), (0, 0)))
        ok_p = jnp.pad(ok_h, (0, pad))                           # pads False
        counts = jax.lax.map(
            lambda args: _count(*args),
            (w_p.reshape(n_chunks, hypothesis_chunk, w.shape[1]),
             ok_p.reshape(n_chunks, hypothesis_chunk)),
        ).reshape(-1)[:num_hypotheses]

    best = jnp.argmax(counts)
    r, t = r_h[best], t_h[best]
    # re-derive the winner's inlier row directly ([C], cheap) instead of
    # holding the full [H, C] matrix just to index one row of it
    warped0 = src_corr @ r.T + t.T
    d2_best = jnp.sum((warped0 - tgt_corr) ** 2, axis=-1)
    best_inliers = (d2_best < distance_threshold**2) & corr_valid
    # --- refinement: weighted Kabsch on the inlier set, re-evaluated ---
    for _ in range(refine_iters):
        w = (best_inliers).astype(jnp.float32)[None, :, None]
        r_ref, t_ref, _ = weighted_kabsch(src_corr[None], tgt_corr[None], w)
        r_new, t_new = r_ref[0], t_ref[0]
        warped = src_corr @ r_new.T + t_new.T
        d2 = jnp.sum((warped - tgt_corr) ** 2, axis=-1)
        new_inliers = (d2 < distance_threshold**2) & corr_valid
        improve = new_inliers.sum() >= best_inliers.sum()
        r = jnp.where(improve, r_new, r)
        t = jnp.where(improve, t_new, t)
        best_inliers = jnp.where(improve, new_inliers, best_inliers)

    return RansacResult(
        rotation=r,
        translation=t,
        inlier_count=best_inliers.sum(),
        best_fraction=best_inliers.sum() / n_valid,
    )
