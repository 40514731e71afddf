"""CoFiNet / Predator / D3Feat / FCGF / URR model-zoo families.

TPU twins of vision3d/models/{cofinet,predator,d3feat,fcgf,urr}: ragged
reference outputs (nonzero, host RNG subsampling) become fixed-capacity
masked tables; [B, C, N] torch layouts become channel-last [B, N, C].
References cited per symbol.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.procrustes import weighted_kabsch
from ..ops.masked import NEG_INF
from ..ops.vision import pairwise_distance
from .pointnets import batched_knn, group_gather


# ---------------------------------------------------------------------------
# CoFiNet (vision3d/models/cofinet)


def cofinet_node_matching(score_mat, min_num_correspondences: int,
                          confidence_threshold: float, capacity: int,
                          src_masks=None, tgt_masks=None):
    """NodeMatching (cofinet/node_matching.py:9-54): exp(log-scores), take
    everything above the confidence threshold, falling back to the global
    top ``min_num_correspondences``. Fixed ``capacity`` output:
    (src_idx, tgt_idx, scores, valid)."""
    score = jnp.exp(score_mat)
    if src_masks is not None:
        score = score * src_masks[:, None]
    if tgt_masks is not None:
        score = score * tgt_masks[None, :]
    above = score > confidence_threshold
    enough = above.sum() >= min_num_correspondences
    n, m = score.shape
    sel = jnp.where(enough, jnp.where(above, score, -1.0), score)
    vals, flat = jax.lax.top_k(sel.reshape(-1), capacity)
    rank = jnp.arange(capacity)
    keep = jnp.where(enough, vals > 0.0, rank < min_num_correspondences)
    scores = score.reshape(-1)[flat]
    keep = keep & (scores > 0)         # reference drops masked zero entries
    return flat // m, flat % m, jnp.where(keep, scores, 0.0), keep


def cofinet_node_proposals(rng, gt_src_corr_indices, gt_tgt_corr_indices,
                           gt_corr_overlaps, valid, num_proposals: int):
    """NodeProposalGenerator (cofinet/node_proposal.py:7-37): sample
    ``num_proposals`` GT node correspondences with probability proportional
    to overlap (without replacement, Gumbel top-k trick)."""
    logp = jnp.where(valid & (gt_corr_overlaps > 0),
                     jnp.log(jnp.clip(gt_corr_overlaps, 1e-12, None)), NEG_INF)
    g = jax.random.gumbel(rng, logp.shape, dtype=logp.dtype)
    _, sel = jax.lax.top_k(logp + g, num_proposals)
    keep = jnp.take(valid, sel) & (jnp.arange(num_proposals) <
                                   jnp.minimum(valid.sum(), num_proposals))
    return (gt_src_corr_indices[sel], gt_tgt_corr_indices[sel],
            gt_corr_overlaps[sel], keep)


# ---------------------------------------------------------------------------
# Predator GCN (vision3d/models/predator/modules.py)


class _EdgeConv(nn.Module):
    """DGCNN-style edge conv: Dense over [x ++ (nbr - x)] + InstanceNorm +
    LeakyReLU(0.2) + max over neighbors (predator/modules.py:34-76)."""
    out_dim: int

    @nn.compact
    def __call__(self, feats, idx):
        nbrs = group_gather(feats, idx)                       # [B, N, k, C]
        x = jnp.concatenate(
            [jnp.broadcast_to(feats[:, :, None, :], nbrs.shape),
             nbrs - feats[:, :, None, :]], axis=-1)
        x = nn.Dense(self.out_dim, use_bias=False, name="conv")(x)
        # torch InstanceNorm2d over (N, k) per channel, no affine
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-5)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return jnp.max(x, axis=2)


class PredatorSelfAttention(nn.Module):
    """Coordinate-guided self-attention (predator/modules.py:34-76): three
    edge-conv stages over a shared knn graph, dense skip concat."""
    feature_dim: int
    k: int = 10

    @nn.compact
    def __call__(self, coords, feats):
        idx = batched_knn(coords, coords, self.k + 1)[:, :, 1:]  # remove self
        x0 = feats
        x1 = _EdgeConv(self.feature_dim, name="edge1")(x0, idx)
        x2 = _EdgeConv(self.feature_dim * 2, name="edge2")(x1, idx)
        x3 = jnp.concatenate([x0, x1, x2], axis=-1)
        x3 = nn.Dense(self.feature_dim, use_bias=False, name="conv3")(x3)
        mu = jnp.mean(x3, axis=1, keepdims=True)
        var = jnp.var(x3, axis=1, keepdims=True)
        x3 = (x3 - mu) / jnp.sqrt(var + 1e-5)
        return nn.leaky_relu(x3, negative_slope=0.2)


class AttentionalPropagation(nn.Module):
    """SuperGlue-style message passing (predator/modules.py:96-127):
    MHA + MLP over [x ++ message]."""
    feature_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, source):
        h, c = self.num_heads, self.feature_dim
        dim = c // h
        q = nn.Dense(c, name="proj_q")(x).reshape(*x.shape[:2], h, dim)
        k = nn.Dense(c, name="proj_k")(source).reshape(*source.shape[:2], h, dim)
        v = nn.Dense(c, name="proj_v")(source).reshape(*source.shape[:2], h, dim)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(jnp.asarray(dim, q.dtype))
        a = jax.nn.softmax(a, axis=-1)
        msg = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(*x.shape[:2], c)
        msg = nn.Dense(c, name="merge")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(c * 2, name="mlp0")(y)
        mu = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.var(y, axis=1, keepdims=True)
        y = (y - mu) / jnp.sqrt(var + 1e-5)                  # InstanceNorm1d
        y = nn.relu(y)
        return nn.Dense(c, name="mlp1", bias_init=nn.initializers.zeros)(y)


class PredatorGCN(nn.Module):
    """Alternating self (edge-conv) / cross (attentional propagation)
    blocks (predator/modules.py:130-158)."""
    feature_dim: int
    num_heads: int
    k: int
    layer_names: Tuple[str, ...]

    @nn.compact
    def __call__(self, coords0, coords1, desc0, desc1):
        for i, name in enumerate(self.layer_names):
            if name == "cross":
                layer = AttentionalPropagation(self.feature_dim, self.num_heads,
                                               name=f"layer{i}_cross")
                desc0 = desc0 + layer(desc0, desc1)
                desc1 = desc1 + layer(desc1, desc0)
            elif name == "self":
                layer = PredatorSelfAttention(self.feature_dim, self.k,
                                              name=f"layer{i}_self")
                desc0 = layer(coords0, desc0)
                desc1 = layer(coords1, desc1)
            else:
                raise KeyError(name)
        return desc0, desc1


# ---------------------------------------------------------------------------
# D3Feat (vision3d/models/d3feat)


def compute_detection_scores(feats, neighbor_indices, training: bool,
                             eps: float = 1e-6):
    """D3Feat keypoint scores (d3feat/detection_score.py:50-76): local
    softplus contrast x depth-wise contrast, hard local-max gate at eval.
    ``neighbor_indices`` use the shadow sentinel == feats.shape[0]."""
    n = feats.shape[0]
    feats = feats / (jnp.max(feats) + eps)
    padded = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    nbr = padded[neighbor_indices]                            # [N, k, C]
    nbr_mask = neighbor_indices != n                          # [N, k]
    num = jnp.sum(nbr_mask, axis=-1, keepdims=True)
    local_mean = jnp.sum(nbr, axis=1) / (num.astype(feats.dtype) + eps)
    local_max_scores = jax.nn.softplus(feats - local_mean)

    depth_mean = jnp.mean(feats, axis=1, keepdims=True)
    depth_max_scores = jax.nn.softplus(feats - depth_mean)

    scores = jnp.max(local_max_scores * depth_max_scores, axis=1)
    if not training:
        local_max = jnp.max(nbr, axis=1)
        is_max = jnp.max(jnp.isclose(feats, local_max).astype(feats.dtype), axis=1)
        scores = scores * is_max
    return scores


@dataclasses.dataclass(frozen=True)
class D3FeatLossConfig:
    log_scale: float = 10.0
    pos_optimal: float = 0.1
    neg_optimal: float = 1.4
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    pos_radius: float = 0.021      # reference adds +0.001 to the config value
    neg_radius: float = 0.05
    alpha_circle: float = 1.0
    alpha_detection: float = 1.0


def _circle_loss_cd_fd(cd, fd, pair_ok, corr_mask, cfg):
    """Metric circle loss over coordinate/feature distance matrices — the
    shared D3Feat/Predator formulation (d3feat/loss.py:53-84 ==
    predator/loss.py:31-58)."""
    pos_mask = (cd < cfg.pos_radius) & pair_ok
    neg_mask = (cd > cfg.neg_radius) & pair_ok
    row_sel = (pos_mask.sum(-1) > 0) & (neg_mask.sum(-1) > 0) & corr_mask
    col_sel = (pos_mask.sum(-2) > 0) & (neg_mask.sum(-2) > 0) & corr_mask
    pos_w = jax.lax.stop_gradient(
        jnp.maximum(jnp.where(pos_mask, fd, -1e5) - cfg.pos_optimal, 0.0))
    neg_w = jax.lax.stop_gradient(
        jnp.maximum(cfg.neg_optimal - jnp.where(neg_mask, fd, 1e5), 0.0))
    lse_pos_row = jax.nn.logsumexp(cfg.log_scale * (fd - cfg.pos_margin) * pos_w, axis=-1)
    lse_pos_col = jax.nn.logsumexp(cfg.log_scale * (fd - cfg.pos_margin) * pos_w, axis=-2)
    lse_neg_row = jax.nn.logsumexp(cfg.log_scale * (cfg.neg_margin - fd) * neg_w, axis=-1)
    lse_neg_col = jax.nn.logsumexp(cfg.log_scale * (cfg.neg_margin - fd) * neg_w, axis=-2)
    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / cfg.log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / cfg.log_scale
    return 0.5 * (
        jnp.sum(jnp.where(row_sel, loss_row, 0.0)) / jnp.maximum(row_sel.sum(), 1)
        + jnp.sum(jnp.where(col_sel, loss_col, 0.0)) / jnp.maximum(col_sel.sum(), 1))


def _feature_match_recall(cd, fd, pair_ok, corr_mask, pos_radius):
    """FMR among anchors that have a true positive (d3feat/loss.py:43-51)."""
    has_pos = ((cd < pos_radius) & pair_ok).sum(-1) > 0
    nn_idx = jnp.argmin(jnp.where(pair_ok, fd, 1e5), axis=-1)
    nn_cd = jnp.take_along_axis(cd, nn_idx[:, None], axis=-1)[:, 0]
    return jnp.sum((nn_cd < pos_radius) & has_pos & corr_mask) / (
        jnp.maximum((has_pos & corr_mask).sum(), 1e-12))


def d3feat_loss(points0, points1, feats0, feats1, scores0, scores1,
                corr_mask, rotation, translation, cfg: D3FeatLossConfig):
    """D3FeatLoss (d3feat/loss.py:28-129) over a fixed-size sampled
    correspondence set: circle loss on coordinate/feature distances +
    detection loss + feature-match recall.

    Args:
      points0/points1: [P, 3] matched point pairs (already subsampled to the
        loss budget; ``corr_mask`` flags padded rows).
      feats0/feats1:   [P, C]; scores0/scores1: [P] detection scores.
      rotation/translation: pose applied to points1 (loss.py:103).
    """
    p1 = points1 @ rotation.T + translation
    cd = jnp.sqrt(jnp.clip(pairwise_distance(points0, p1, squared=True), 1e-12, None))
    fd = jnp.sqrt(jnp.clip(pairwise_distance(feats0, feats1, squared=True), 1e-12, None))
    pair_ok = corr_mask[:, None] & corr_mask[None, :]
    circle = _circle_loss_cd_fd(cd, fd, pair_ok, corr_mask, cfg)

    # detection loss (loss.py:86-103): diagonal is the positive
    eye = jnp.eye(fd.shape[0], dtype=bool) & pair_ok
    furthest_pos = jnp.max(jnp.where(eye, fd, 0.0), axis=1)
    closest_neg = jnp.min(jnp.where(eye | ~pair_ok, 1e5, fd), axis=1)
    det_vals = (furthest_pos - closest_neg) * (scores0 + scores1)
    detection = jnp.sum(jnp.where(corr_mask, det_vals, 0.0)) / jnp.maximum(corr_mask.sum(), 1)

    # feature-match recall (loss.py:43-51)
    recall = _feature_match_recall(cd, fd, pair_ok, corr_mask, cfg.pos_radius)

    overall = cfg.alpha_circle * circle + cfg.alpha_detection * detection
    return {"overall_loss": overall, "circle_loss": circle,
            "detection_loss": detection, "recall": recall}


@dataclasses.dataclass(frozen=True)
class PredatorLossConfig:
    log_scale: float = 10.0
    pos_optimal: float = 0.1
    neg_optimal: float = 1.4
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    pos_radius: float = 0.0375
    neg_radius: float = 0.1
    saliency_pos_radius: float = 0.075
    alpha_circle: float = 1.0
    alpha_overlap: float = 1.0
    alpha_saliency: float = 1.0


def _weighted_bce(preds, labels, mask):
    """Predator's class-balanced BCE (predator/loss.py:71-93) + masked
    precision/recall (the reference uses sklearn on host)."""
    neg_w = jnp.sum(jnp.where(mask, labels, 0.0)) / jnp.maximum(mask.sum(), 1)
    w = jnp.where(labels >= 0.5, 1.0 - neg_w, neg_w)
    p = jnp.clip(preds, 1e-7, 1.0 - 1e-7)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))
    loss = jnp.sum(jnp.where(mask, w * bce, 0.0)) / jnp.maximum(mask.sum(), 1)
    pred_pos = (preds >= 0.5) & mask
    true_pos = pred_pos & (labels >= 0.5)
    precision = true_pos.sum() / jnp.maximum(pred_pos.sum(), 1)
    recall = true_pos.sum() / jnp.maximum(((labels >= 0.5) & mask).sum(), 1)
    return loss, precision, recall


def predator_loss(points0, points1, feats0, feats1, mask0, mask1,
                  corr_pairs, corr_mask, rotation, translation,
                  overlap_scores0, overlap_scores1,
                  saliency_scores0, saliency_scores1,
                  cfg: PredatorLossConfig):
    """PredatorLoss (predator/loss.py:11-180): circle loss on sampled GT
    correspondences + class-balanced BCE on overlap and saliency scores.

    Static-shape twin: the reference's ``set(correspondences)`` membership
    becomes a scatter mask; its host subsampling to max_points is the
    caller's job (pass pre-sampled ``corr_pairs`` [P, 2] + ``corr_mask``).
    ``points1`` is moved into frame 0 by (rotation, translation).
    Saliency GT: mutual-NN feature matches among in-overlap points whose
    aligned distance < saliency_pos_radius (loss.py:113-131).
    """
    p1 = points1 @ rotation.T + translation
    i0, i1 = corr_pairs[:, 0], corr_pairs[:, 1]
    n, m = points0.shape[0], points1.shape[0]
    # scatter membership through a sentinel row for padded pairs (.set with
    # duplicate indices picks an arbitrary winner — a padded row aliasing a
    # real index could erase its membership)
    in_ov0 = jnp.zeros(n + 1, bool).at[jnp.where(corr_mask, i0, n)].set(True)[:n] & mask0
    in_ov1 = jnp.zeros(m + 1, bool).at[jnp.where(corr_mask, i1, m)].set(True)[:m] & mask1

    # overlap BCE: labels are overlap membership (loss.py:138-148)
    ov_loss0, ov_p0, ov_r0 = _weighted_bce(
        jnp.concatenate([overlap_scores0, overlap_scores1]),
        jnp.concatenate([in_ov0, in_ov1]).astype(points0.dtype),
        jnp.concatenate([mask0, mask1]))

    # saliency BCE over in-overlap points: NN in feature space among the
    # overlap subsets, positive when the aligned NN distance is small
    sim = feats0 @ feats1.T
    sim = jnp.where(in_ov0[:, None] & in_ov1[None, :], sim, -1e9)
    nn0 = jnp.argmax(sim, axis=1)
    nn1 = jnp.argmax(sim, axis=0)
    d0 = jnp.linalg.norm(points0 - p1[nn0], axis=1)
    d1 = jnp.linalg.norm(p1 - points0[nn1], axis=1)
    sal_labels = jnp.concatenate([(d0 < cfg.saliency_pos_radius),
                                  (d1 < cfg.saliency_pos_radius)])
    sal_loss, sal_p, sal_r = _weighted_bce(
        jnp.concatenate([saliency_scores0, saliency_scores1]),
        sal_labels.astype(points0.dtype),
        jnp.concatenate([in_ov0, in_ov1]))

    # circle loss + FMR on the sampled correspondence set (loss.py:150-171)
    c0, c1 = points0[i0], p1[i1]
    f0, f1 = feats0[i0], feats1[i1]
    cd = jnp.sqrt(jnp.clip(pairwise_distance(c0, c1, squared=True), 1e-12, None))
    fd = jnp.sqrt(jnp.clip(pairwise_distance(f0, f1, squared=True), 1e-12, None))
    pair_ok = corr_mask[:, None] & corr_mask[None, :]
    circle = _circle_loss_cd_fd(cd, fd, pair_ok, corr_mask, cfg)
    recall = _feature_match_recall(cd, fd, pair_ok, corr_mask, cfg.pos_radius)

    overall = (cfg.alpha_circle * circle + cfg.alpha_overlap * ov_loss0
               + cfg.alpha_saliency * sal_loss)
    return {"overall_loss": overall, "circle_loss": circle, "recall": recall,
            "overlap_loss": ov_loss0, "overlap_precision": ov_p0,
            "overlap_recall": ov_r0, "saliency_loss": sal_loss,
            "saliency_precision": sal_p, "saliency_recall": sal_r}


# ---------------------------------------------------------------------------
# FCGF (vision3d/models/fcgf/modules.py)

def fcgf_hardest_contrastive_loss(feats0, feats1, pos_pairs, pos_pair_mask,
                                  pos_thresh, neg_thresh, **kw):
    """FCGF's HardestContrastiveLoss. The reference file is a broken copy of
    vision3d/loss/hardest_contrastive_loss.py (``torch.from_nupy`` /
    ``.pos(2)`` typos make it unimportable — fcgf/modules.py:44-71); the
    working twin lives in engine/loss_library.py and is re-exported here."""
    from ..engine.loss_library import hardest_contrastive_loss
    return hardest_contrastive_loss(feats0, feats1, pos_pairs, pos_pair_mask,
                                    pos_thresh, neg_thresh, **kw)


# ---------------------------------------------------------------------------
# URR (vision3d/models/urr)


def urr_extract_correspondences(src_points, tgt_points, src_feats, tgt_feats,
                                num_correspondences: int, eps: float = 1e-8):
    """CorrespondenceExtractor (urr/matching.py:10-77): two-way Lowe-ratio
    weighted nearest-neighbor matching in (normalized) feature space; the
    best ``num_correspondences`` per direction are concatenated.

    Returns (src_corr, tgt_corr, weights) with 2*num_correspondences rows.
    """
    def one_side(q_pts, s_pts, q_f, s_f):
        sim = q_f @ s_f.T                                    # normalized feats
        d = 1.0 - sim
        neg, idx = jax.lax.top_k(-d, 2)                      # two smallest
        d1, d2 = -neg[:, 0], -neg[:, 1]
        weights = 1.0 - d1 / (d2 + eps)
        w_top, q_idx = jax.lax.top_k(weights, num_correspondences)
        s_idx = idx[q_idx, 0]
        return q_pts[q_idx], s_pts[s_idx], w_top

    s1, t1, w1 = one_side(src_points, tgt_points, src_feats, tgt_feats)
    t2, s2, w2 = one_side(tgt_points, src_points, tgt_feats, src_feats)
    return (jnp.concatenate([s1, s2]), jnp.concatenate([t1, t2]),
            jnp.concatenate([w1, w2]))


def randomized_weighted_procrustes(rng, src_corr_points, tgt_corr_points,
                                   corr_weights, num_subsets: int,
                                   num_samples: int):
    """RandomizedWeightedProcrustes (urr/registration.py:10-66): solve
    ``num_subsets`` weighted Procrustes problems on random subsets, keep the
    transform with the lowest weighted residual. Batched [B, N, 3] inputs;
    returns (R [B,3,3], t [B,3]).

    Like the reference, one set of subset indices is shared across the batch
    (registration.py:29 "for simplicity").
    """
    b, n, _ = src_corr_points.shape
    sel = jax.vmap(lambda k: jax.random.permutation(k, n)[:num_samples])(
        jax.random.split(rng, num_subsets))                  # [T, K]
    src_sub = src_corr_points[:, sel]                        # [B, T, K, 3]
    tgt_sub = tgt_corr_points[:, sel]
    w_sub = corr_weights[:, sel]                             # [B, T, K]
    r, t, _ = weighted_kabsch(src_sub.reshape(b * num_subsets, num_samples, 3),
                              tgt_sub.reshape(b * num_subsets, num_samples, 3),
                              w_sub.reshape(b * num_subsets, num_samples, 1))
    r = r.reshape(b, num_subsets, 3, 3)
    t = t.reshape(b, num_subsets, 3)
    aligned = jnp.einsum("btij,bnj->btni", r, src_corr_points) + t[:, :, None, :]
    err = jnp.linalg.norm(aligned - tgt_corr_points[:, None], axis=-1)  # [B,T,N]
    werr = jnp.mean(err * corr_weights[:, None, :], axis=-1)            # [B,T]
    best = jnp.argmin(werr, axis=1)
    bi = jnp.arange(b)
    return r[bi, best], t[bi, best]


def differentiable_render(pcd_points, pcd_colors, pcd_feats, intrinsics,
                          image_h: int, image_w: int, num_samples: int,
                          radius: float, sigma: float,
                          weighting_fn: str = "exponential",
                          compositing_fn: str = "weighted",
                          eps: float = 1e-10, min_depth: float = 1e-6):
    """DifferentiableRenderer (urr/render.py:14-168): project points, knn
    rasterize per pixel with z-sorted soft weights, composite depth / color /
    feature images. Points behind the camera are pushed to infinity instead
    of dropped (static shapes). Returns (depths, colors, feats, masks)."""
    depths = pcd_points[:, 2]
    front = depths > min_depth
    fx, fy, cx, cy = intrinsics[0, 0], intrinsics[1, 1], intrinsics[0, 2], intrinsics[1, 2]
    z = jnp.where(front, depths, 1.0)
    px = jnp.stack([pcd_points[:, 0] * fx / z + cx,
                    pcd_points[:, 1] * fy / z + cy], axis=-1)
    px = jnp.where(front[:, None], px, 1e6)

    vs, us = jnp.meshgrid(jnp.arange(image_h, dtype=px.dtype),
                          jnp.arange(image_w, dtype=px.dtype), indexing="ij")
    img_px = jnp.stack([us.reshape(-1), vs.reshape(-1)], axis=-1)  # (HW, 2) (x, y)

    d = jnp.sqrt(jnp.clip(pairwise_distance(img_px, px, squared=True), 1e-12, None))
    negd, idx = jax.lax.top_k(-d, num_samples)               # (HW, K) nearest
    # z-sort the knn set (reference rasterize sorts by depth, render.py:31-35)
    zb = depths[idx]
    order = jnp.argsort(zb, axis=-1)
    idx = jnp.take_along_axis(idx, order, axis=-1)
    dist = jnp.take_along_axis(-negd, order, axis=-1)
    masks = dist < radius

    if weighting_fn == "exponential":
        w = jnp.exp(-dist ** 2 / sigma ** 2) * masks
    else:
        w = (1.0 - dist ** 2 / sigma ** 2) * masks
    if compositing_fn == "weighted":
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    else:  # alpha
        alphas = jnp.concatenate([jnp.ones_like(w[..., :1]),
                                  1.0 - w[..., :-1] + eps], axis=-1)
        w = w * jnp.cumprod(alphas, axis=-1)

    out_depth = jnp.sum(depths[idx] * w, axis=-1).reshape(image_h, image_w)
    out_colors = None
    if pcd_colors is not None:
        out_colors = jnp.sum(pcd_colors[idx] * w[..., None], axis=-2)
        out_colors = out_colors.reshape(image_h, image_w, -1)
    out_feats = None
    if pcd_feats is not None:
        out_feats = jnp.sum(pcd_feats[idx] * w[..., None], axis=-2)
        out_feats = out_feats.reshape(image_h, image_w, -1)
    out_mask = jnp.any(masks, axis=-1).reshape(image_h, image_w)
    return out_depth, out_colors, out_feats, out_mask
