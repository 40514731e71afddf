"""GeoTransformer model family (vision3d/models/geotransformer/) — TPU twins.

Covers the library components: GeometricStructureEmbedding (V1/V2),
GeometricTransformer (+Lite), superpoint matching (mutual top-k / adaptive),
PointMatching, and LocalGlobalRegistration. All static-shape: ragged
reference outputs (nonzero / boolean indexing) become fixed-capacity index
tables with validity masks, and the LGR hypothesis search is a batched
vmap + argmax instead of host chunking (local_global_registration.py:54-98's
``convert_to_batch`` exists only to batch torch's ragged extraction — the
masked formulation needs none of it).

Reference: vision3d/models/geotransformer/*.py (cited per symbol).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.procrustes import weighted_kabsch
from ..nn.layers2d3d import TransformerLayer
from ..ops.masked import NEG_INF
from ..ops.partition import batch_mutual_topk_select
from ..ops.vision import pairwise_distance


def sinusoidal_embedding(indices, d_model: int):
    """vision3d SinusoidalEmbedding (layers/embedding.py:11-47): [...,]
    float indices -> [..., d_model] with interleaved [sin, cos] pairs."""
    half = d_model // 2
    div = jnp.exp(jnp.arange(half, dtype=indices.dtype)
                  * (-math.log(10000.0) * 2.0 / d_model))
    omegas = indices[..., None] * div                      # [..., d/2]
    emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)
    return jax.lax.stop_gradient(emb.reshape(*indices.shape, d_model))


def _knn_exclude_self(points, k, mask=None):
    """Indices of the k nearest OTHER points: [B, N, k] (smallest distances,
    self dropped — geometric_structure_embedding.py:59-63)."""
    d = pairwise_distance(points, points, squared=True)
    n = points.shape[-2]
    d = d + jnp.eye(n, dtype=d.dtype) * 1e10
    if mask is not None:
        d = jnp.where(mask[..., None, :], d, 1e10)
    _, idx = jax.lax.top_k(-d, k)
    return idx


def _pair_angles(points, knn_indices):
    """Triplet angles between each pair direction and each anchor's knn
    directions: [B, N, N, k] (geometric_structure_embedding.py:64-72)."""
    knn_points = jnp.take_along_axis(
        points[:, None, :, :], knn_indices[..., None].repeat(3, -1), axis=2)  # [B,N,k,3]
    ref = knn_points - points[:, :, None, :]                 # [B, N, k, 3]
    anc = points[:, None, :, :] - points[:, :, None, :]      # [B, N, N, 3]
    cross = jnp.cross(ref[:, :, None, :, :], anc[:, :, :, None, :])  # [B,N,N,k,3]
    sin_v = jnp.linalg.norm(cross, axis=-1)
    cos_v = jnp.sum(ref[:, :, None, :, :] * anc[:, :, :, None, :], axis=-1)
    return jnp.arctan2(sin_v, cos_v)                         # [B, N, N, k]


class GeometricStructureEmbedding(nn.Module):
    """Pairwise distance + triplet angle embedding
    (geometric_structure_embedding.py:12-109)."""
    hidden_dim: int
    sigma_d: float
    sigma_a: float = 15.0
    angle_k: int = 3
    angle_reduction: str = "max"     # 'max' | 'mean'
    use_angle_embed: bool = True

    @nn.compact
    def __call__(self, points, mask=None):
        dist = jnp.sqrt(jnp.clip(pairwise_distance(points, points, squared=True),
                                 1e-12, None))
        d_indices = jax.lax.stop_gradient(dist / self.sigma_d)
        emb = nn.Dense(self.hidden_dim, name="proj_d")(
            sinusoidal_embedding(d_indices, self.hidden_dim))

        if self.use_angle_embed:
            k = min(self.angle_k, points.shape[-2] - 1)
            knn_idx = _knn_exclude_self(points, k, mask)
            a_indices = jax.lax.stop_gradient(
                _pair_angles(points, knn_idx) * (180.0 / (self.sigma_a * math.pi)))
            a_emb = nn.Dense(self.hidden_dim, name="proj_a")(
                sinusoidal_embedding(a_indices, self.hidden_dim))
            if self.angle_reduction == "max":
                a_emb = jnp.max(a_emb, axis=3)
            else:
                a_emb = jnp.mean(a_emb, axis=3)
            emb = emb + a_emb
        return emb


class GeometricStructureEmbeddingV2(nn.Module):
    """V2: integer-degree quantized angle table + fused output projection
    (geometric_structure_embedding.py:112-202)."""
    hidden_dim: int
    sigma_d: float
    sigma_a: float = 15.0
    angle_k: int = 3
    angle_reduction: str = "max"

    @nn.compact
    def __call__(self, points, mask=None):
        dist = jnp.sqrt(jnp.clip(pairwise_distance(points, points, squared=True),
                                 1e-12, None))
        d_indices = jax.lax.stop_gradient(dist / self.sigma_d)
        d_emb = nn.Dense(self.hidden_dim, name="proj_d")(
            sinusoidal_embedding(d_indices, self.hidden_dim))

        knn_idx = _knn_exclude_self(points, self.angle_k, mask)
        deg = jnp.round(_pair_angles(points, knn_idx) * (180.0 / math.pi))
        deg = jax.lax.stop_gradient(jnp.clip(deg, 0, 180).astype(jnp.int32))
        # 181-entry table embedded once, gathered per pair (reference
        # index_select over arange(181)/sigma_a)
        table = nn.Dense(self.hidden_dim, name="proj_a")(
            sinusoidal_embedding(jnp.arange(181, dtype=points.dtype) / self.sigma_a,
                                 self.hidden_dim))
        a_emb = table[deg]                                   # [B,N,N,k,C]
        if self.angle_reduction == "max":
            a_emb = jnp.max(a_emb, axis=3)
        else:
            a_emb = jnp.mean(a_emb, axis=3)

        emb = nn.leaky_relu(d_emb + a_emb, negative_slope=0.2)
        emb = nn.Dense(self.hidden_dim, name="proj_e")(emb)
        return nn.LayerNorm(name="norm", epsilon=1e-5)(emb)


class GeometricTransformer(nn.Module):
    """Self(RPE)/cross transformer over superpoint features
    (geometric_transformer.py:8-123)."""
    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Tuple[str, ...]
    sigma_d: float
    sigma_a: float = 15.0
    angle_k: int = 3
    angle_reduction: str = "max"
    use_angle_embed: bool = True
    lite: bool = False            # GeometricTransformerLite: V2 embedding

    @nn.compact
    def __call__(self, src_points, tgt_points, src_feats, tgt_feats,
                 src_masks=None, tgt_masks=None):
        if self.lite:
            embed = GeometricStructureEmbeddingV2(
                self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k,
                self.angle_reduction, name="embedding")
        else:
            embed = GeometricStructureEmbedding(
                self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k,
                self.angle_reduction, self.use_angle_embed, name="embedding")
        src_emb = embed(src_points, src_masks)
        tgt_emb = embed(tgt_points, tgt_masks)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        src, tgt = in_proj(src_feats), in_proj(tgt_feats)

        for i, block in enumerate(self.blocks):
            # lite uses plain attention w/ additive qk embeds (no extra proj)
            qk_proj = (block == "self") and not self.lite
            layer = TransformerLayer(self.hidden_dim, self.num_heads,
                                     qk_embed_proj=qk_proj, name=f"transformer{i}")
            if block == "self":
                src = layer(src, src, src, src_masks, qk_embeds=src_emb)
                tgt = layer(tgt, tgt, tgt, tgt_masks, qk_embeds=tgt_emb)
            elif block == "cross":
                src = layer(src, tgt, tgt, tgt_masks)
                tgt = layer(tgt, src, src, src_masks)
            else:
                raise KeyError(block)

        out = nn.Dense(self.output_dim, name="out_proj")
        return out(src), out(tgt)


class VanillaSiameseTransformer(nn.Module):
    """Plain (no RPE) siamese self/cross transformer
    (siamese_transformer/vanilla_siamese_transformer.py:9-53)."""
    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Tuple[str, ...]

    @nn.compact
    def __call__(self, src_feats, tgt_feats, src_masks=None, tgt_masks=None):
        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        src, tgt = in_proj(src_feats), in_proj(tgt_feats)
        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(self.hidden_dim, self.num_heads,
                                     name=f"transformer{i}")
            if block == "self":
                src = layer(src, src, src, src_masks)
                tgt = layer(tgt, tgt, tgt, tgt_masks)
            else:
                src = layer(src, tgt, tgt, tgt_masks)
                tgt = layer(tgt, src, src, src_masks)
        out = nn.Dense(self.output_dim, name="out_proj")
        return out(src), out(tgt)


def _flat_topk_correspondences(score, valid, capacity, largest):
    """Fixed-capacity extraction of the best valid entries of a 2D score
    matrix: returns (src_idx, tgt_idx, scores, mask) each [capacity]."""
    n, m = score.shape
    s = jnp.where(valid, score if largest else -score, NEG_INF)
    vals, flat_idx = jax.lax.top_k(s.reshape(-1), capacity)
    keep = vals > NEG_INF / 2
    src_idx = flat_idx // m
    tgt_idx = flat_idx % m
    out_scores = jnp.where(keep, score.reshape(-1)[flat_idx], 0.0)
    return src_idx, tgt_idx, out_scores, keep


def superpoint_matching_mutual_topk(
    src_feats, tgt_feats, k: int, num_correspondences: int,
    src_masks=None, tgt_masks=None, threshold: Optional[float] = None,
    mutual: bool = True, eps: float = 1e-8):
    """SuperPointMatchingMutualTopk (superpoint_matching_mutual_topk.py:7-72).

    Feature-distance mutual top-k with a threshold + not-enough fallback to
    global top-k; static capacity ``num_correspondences``. Features are
    expected L2-normalized (the reference computes the normalized pairwise
    distance). Returns (src_idx, tgt_idx, scores, valid).
    """
    dist = jnp.sqrt(pairwise_distance(src_feats, tgt_feats, squared=True) + eps)
    valid = jnp.ones(dist.shape, bool)
    if src_masks is not None:
        valid &= src_masks[:, None]
    if tgt_masks is not None:
        valid &= tgt_masks[None, :]
    corr = batch_mutual_topk_select(
        dist[None], k, largest=False, mutual=mutual,
        valid_row=None if src_masks is None else src_masks[None],
        valid_col=None if tgt_masks is None else tgt_masks[None])[0] & valid
    if threshold is not None:
        good = corr & (dist <= threshold)
        # fallback to pure top-k among mutual-topk entries when not enough
        # survive the threshold (reference lines 47-58)
        enough = good.sum() >= num_correspondences
        corr = jnp.where(enough, good, corr)
    return _flat_topk_correspondences(dist, corr, num_correspondences,
                                      largest=False)


def superpoint_matching_global_topk(
    src_feats, tgt_feats, num_correspondences: int,
    src_masks=None, tgt_masks=None, src_weights=None, tgt_weights=None,
    dual_normalization: bool = True):
    """SuperPointMatchingGlobalTopk (superpoint_matching_global_topk.py:10-75):
    exp(-normalized-distance) similarity with optional dual normalization and
    per-node weights, global top ``num_correspondences``. Masked entries are
    excluded from both the normalizing sums and the selection."""
    d2 = pairwise_distance(src_feats, tgt_feats, squared=True)
    score = jnp.exp(-d2)
    valid = jnp.ones(score.shape, bool)
    if src_masks is not None:
        valid &= src_masks[:, None]
    if tgt_masks is not None:
        valid &= tgt_masks[None, :]
    score = jnp.where(valid, score, 0.0)
    if dual_normalization:
        s_row = score / jnp.clip(score.sum(axis=1, keepdims=True), 1e-12, None)
        s_col = score / jnp.clip(score.sum(axis=0, keepdims=True), 1e-12, None)
        score = s_row * s_col
    if src_weights is not None:
        score = score * src_weights[:, None]
    if tgt_weights is not None:
        score = score * tgt_weights[None, :]
    return _flat_topk_correspondences(score, valid, num_correspondences,
                                      largest=True)


def adaptive_superpoint_matching(
    src_feats, tgt_feats, min_num_correspondences: int,
    similarity_threshold: float, src_masks=None, tgt_masks=None,
    capacity: Optional[int] = None):
    """AdaptiveSuperPointMatching (adaptive_superpoint_matching.py:7-60):
    all pairs under the similarity threshold, falling back to the global
    top ``min_num_correspondences`` when too few. ``capacity`` bounds the
    static output size (default: min_num_correspondences * 8)."""
    capacity = capacity or min_num_correspondences * 8
    dist = jnp.sqrt(jnp.clip(pairwise_distance(src_feats, tgt_feats, squared=True),
                             1e-12, None))
    valid = jnp.ones(dist.shape, bool)
    if src_masks is not None:
        valid &= src_masks[:, None]
    if tgt_masks is not None:
        valid &= tgt_masks[None, :]
    under = valid & (dist <= similarity_threshold)
    enough = under.sum() >= min_num_correspondences
    src_idx, tgt_idx, scores, keep = _flat_topk_correspondences(
        dist, jnp.where(enough, under, valid), capacity, largest=False)
    # when falling back, keep exactly the best min_num_correspondences
    rank = jnp.arange(capacity)
    keep = keep & jnp.where(enough, True, rank < min_num_correspondences)
    return src_idx, tgt_idx, scores, keep


@dataclasses.dataclass(frozen=True)
class PointMatchingConfig:
    """point_matching.py:7-33 / local_global_registration.py:12-50 knobs.

    ``selection='threshold'`` switches to the
    LocalGlobalRegistrationThreshold variant
    (local_global_registration_threshold.py): every pair above the
    confidence threshold is a correspondence, no top-k."""
    k: int = 3
    mutual: bool = True
    confidence_threshold: float = 0.05
    use_dustbin: bool = False
    use_global_score: bool = False
    selection: str = "mutual_topk"     # 'mutual_topk' | 'threshold'


def deduplicate_correspondences(src_idx, tgt_idx, valid, num_cols: int):
    """Mask repeated (src, tgt) pairs, keeping one occurrence — the
    LocalGlobalRegistrationWithDuplicateRemoval behavior
    (local_global_registration_duplicate_removal.py:101-133) as a static
    masking pass over extracted index tables."""
    key = src_idx.astype(jnp.int32) * num_cols + tgt_idx.astype(jnp.int32)
    # give every invalid row its own unique negative key so it never merges
    key = jnp.where(valid, key, -1 - jnp.arange(key.shape[0], dtype=jnp.int32))
    order = jnp.argsort(key)
    ks = key[order]
    first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    keep = jnp.zeros_like(valid).at[order].set(first)
    return valid & keep


def point_matching_scores(score_mat, src_knn_masks, tgt_knn_masks,
                          global_scores, cfg: PointMatchingConfig,
                          use_logits: bool = True):
    """Shared front half of PointMatching / LGR: per-patch mutual-topk (or
    threshold) corr mask + gated scores (point_matching.py:63-86)."""
    if use_logits:
        score_mat = jnp.exp(score_mat)
    if cfg.selection == "threshold":
        corr = score_mat > cfg.confidence_threshold
        if src_knn_masks is not None:
            corr &= src_knn_masks[..., :, None]
        if tgt_knn_masks is not None:
            corr &= tgt_knn_masks[..., None, :]
    else:
        corr = batch_mutual_topk_select(
            score_mat, cfg.k, valid_row=src_knn_masks, valid_col=tgt_knn_masks,
            threshold=cfg.confidence_threshold, mutual=cfg.mutual)
    if cfg.use_dustbin:
        corr = corr[:, :-1, :-1]
        score_mat = score_mat[:, :-1, :-1]
    if cfg.use_global_score:
        score_mat = score_mat * global_scores[:, None, None]
    return score_mat * corr, corr


def point_matching(src_knn_points, tgt_knn_points, src_knn_masks,
                   tgt_knn_masks, src_knn_indices, tgt_knn_indices,
                   score_mat, global_scores, cfg: PointMatchingConfig,
                   max_correspondences: int):
    """PointMatching (point_matching.py:33-91): extract up to
    ``max_correspondences`` point correspondences across all patch pairs.

    Returns (src_points, tgt_points, src_indices, tgt_indices, scores, valid)
    with a fixed capacity instead of the reference's ragged nonzero output.
    """
    gated, corr = point_matching_scores(
        score_mat, src_knn_masks, tgt_knn_masks, global_scores, cfg)
    b, kk, _ = gated.shape
    flat = gated.reshape(-1)
    vals, flat_idx = jax.lax.top_k(jnp.where(corr.reshape(-1), flat, -1.0),
                                   max_correspondences)
    valid = vals > 0.0
    bi = flat_idx // (kk * kk)
    si = (flat_idx // kk) % kk
    ti = flat_idx % kk
    return (src_knn_points[bi, si], tgt_knn_points[bi, ti],
            src_knn_indices[bi, si], tgt_knn_indices[bi, ti],
            jnp.where(valid, vals, 0.0), valid)


@dataclasses.dataclass(frozen=True)
class LGRConfig:
    matching: PointMatchingConfig = PointMatchingConfig()
    acceptance_radius: float = 0.1
    use_logits: bool = True
    min_local_correspondences: int = 3
    max_global_correspondences: int = 2048
    num_refinement_steps: int = 5


def local_global_registration(src_knn_points, tgt_knn_points, src_knn_masks,
                              tgt_knn_masks, score_mat, global_scores,
                              cfg: LGRConfig):
    """LocalGlobalRegistration (local_global_registration.py:11-229).

    Per-patch weighted-Procrustes hypotheses -> best-by-inliers over the
    global correspondence set -> iterative reweighted refinement. Fully
    batched: each patch solves over its dense K x K weight matrix (zero
    weights are no-ops), hypotheses verify in one [P, G] residual pass, and
    the refinement loop is a lax.fori_loop. Returns
    (src_corr_points, tgt_corr_points, corr_scores, corr_valid, R [3,3],
    t [3]) for the single pair the patches came from.
    """
    gated, corr = point_matching_scores(
        score_mat, src_knn_masks, tgt_knn_masks, global_scores, cfg.matching,
        use_logits=cfg.use_logits)
    b, kk, _ = gated.shape

    # global correspondence set (capacity max_global_correspondences)
    g = cfg.max_global_correspondences
    flat = gated.reshape(-1)
    vals, flat_idx = jax.lax.top_k(jnp.where(corr.reshape(-1), flat, -1.0), g)
    g_valid = vals > 0.0
    bi = flat_idx // (kk * kk)
    si = (flat_idx // kk) % kk
    ti = flat_idx % kk
    g_src = src_knn_points[bi, si] * g_valid[:, None]
    g_tgt = tgt_knn_points[bi, ti] * g_valid[:, None]
    g_scores = jnp.where(g_valid, vals, 0.0)

    # local hypotheses: one weighted Procrustes per patch over its K*K pairs
    pair_src = jnp.broadcast_to(src_knn_points[:, :, None, :], (b, kk, kk, 3)).reshape(b, kk * kk, 3)
    pair_tgt = jnp.broadcast_to(tgt_knn_points[:, None, :, :], (b, kk, kk, 3)).reshape(b, kk * kk, 3)
    pair_w = gated.reshape(b, kk * kk, 1)
    r_h, t_h, _ = weighted_kabsch(pair_src, pair_tgt, pair_w)   # [B,3,3],[B,3,1]
    hyp_ok = corr.sum(axis=(1, 2)) >= cfg.min_local_correspondences

    # verify hypotheses on the global set
    aligned = jnp.einsum("bij,gj->bgi", r_h, g_src) + jnp.swapaxes(t_h, 1, 2)
    residuals = jnp.linalg.norm(g_tgt[None] - aligned, axis=-1)  # [B, G]
    inliers = (residuals < cfg.acceptance_radius) & g_valid[None]
    counts = jnp.where(hyp_ok, inliers.sum(axis=1), -1)
    best = jnp.argmax(counts)
    # degenerate fallback (no valid patch hypothesis): all-correspondence
    # solve, matching the reference else-branch (lines 135-141)
    r0, t0, _ = weighted_kabsch(g_src[None], g_tgt[None], g_scores[None, :, None])
    any_ok = jnp.any(hyp_ok)
    r_best = jnp.where(any_ok, r_h[best], r0[0])
    t_best = jnp.where(any_ok, t_h[best], t0[0])

    def refine(_, rt):
        r, t = rt
        aligned = g_src @ r.T + t[:, 0]
        resid = jnp.linalg.norm(g_tgt - aligned, axis=-1)
        w = g_scores * (resid < cfg.acceptance_radius)
        r2, t2, _ = weighted_kabsch(g_src[None], g_tgt[None], w[None, :, None])
        return r2[0], t2[0]

    r_fin, t_fin = jax.lax.fori_loop(0, cfg.num_refinement_steps, refine,
                                     (r_best, t_best))
    return g_src, g_tgt, g_scores, g_valid, r_fin, t_fin[:, 0]
