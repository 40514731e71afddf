"""2D-3D branch losses: weighted circle loss + focal matching (+ denoising).

Re-implements vision3d circle_loss (vision3d/loss/circle_loss.py:10-54) and
the experiment's OverallLoss structure (Diff-Reg-2d3d/experiments/.../
loss.py:9-125): circle loss on coarse fused features (main and denoising
paths) with overlap-derived positive/negative masks, plus the focal matching
loss on both predicted and denoised matrices. Fully masked/static.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.vision import pairwise_distance
from .losses import LossConfig, focal_correspondence_loss


@dataclasses.dataclass(frozen=True)
class CircleLossConfig:
    positive_margin: float = 0.1
    negative_margin: float = 1.4
    positive_optimal: float = 0.1
    negative_optimal: float = 1.4
    log_scale: float = 40.0
    positive_overlap: float = 0.3
    negative_overlap: float = 0.2


def circle_loss(feat_dists, pos_masks, neg_masks, cfg: CircleLossConfig,
                pos_scales=None, row_valid=None, col_valid=None):
    """Weighted circle loss over a [N, M] feature-distance matrix.

    Anchors (rows/cols) participate only if they have >=1 positive AND >=1
    negative; means are over participating anchors (circle_loss.py:23-52).
    """
    row_masks = (pos_masks.sum(-1) > 0) & (neg_masks.sum(-1) > 0)
    col_masks = (pos_masks.sum(-2) > 0) & (neg_masks.sum(-2) > 0)
    if row_valid is not None:
        row_masks = row_masks & row_valid
    if col_valid is not None:
        col_masks = col_masks & col_valid

    pos_w = feat_dists - 1e5 * (~pos_masks).astype(feat_dists.dtype)
    pos_w = jnp.maximum(pos_w - cfg.positive_optimal, 0.0)
    if pos_scales is not None:
        pos_w = pos_w * pos_scales
    pos_w = jax.lax.stop_gradient(pos_w)

    neg_w = feat_dists + 1e5 * (~neg_masks).astype(feat_dists.dtype)
    neg_w = jnp.maximum(cfg.negative_optimal - neg_w, 0.0)
    neg_w = jax.lax.stop_gradient(neg_w)

    logits_pos = cfg.log_scale * (feat_dists - cfg.positive_margin) * pos_w
    logits_neg = cfg.log_scale * (cfg.negative_margin - feat_dists) * neg_w

    lp_row = jax.nn.logsumexp(logits_pos, axis=-1)
    lp_col = jax.nn.logsumexp(logits_pos, axis=-2)
    ln_row = jax.nn.logsumexp(logits_neg, axis=-1)
    ln_col = jax.nn.logsumexp(logits_neg, axis=-2)

    loss_row = jax.nn.softplus(lp_row + ln_row) / cfg.log_scale
    loss_col = jax.nn.softplus(lp_col + ln_col) / cfg.log_scale

    mean_row = jnp.sum(jnp.where(row_masks, loss_row, 0.0)) / jnp.maximum(row_masks.sum(), 1)
    mean_col = jnp.sum(jnp.where(col_masks, loss_col, 0.0)) / jnp.maximum(col_masks.sum(), 1)
    return 0.5 * (mean_row + mean_col)


def normalized_feat_dists(a, b, eps=1e-8):
    """sqrt pairwise distance of L2-normalized features (loss.py:38)."""
    an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), eps, None)
    bn = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), eps, None)
    return jnp.sqrt(pairwise_distance(an, bn) + eps)


def overlap_masks(overlaps, circle_cfg: CircleLossConfig):
    """pos/neg masks + sqrt-overlap positive scales from a dense overlap
    matrix (loss.py:41-48)."""
    pos = overlaps > circle_cfg.positive_overlap
    neg = overlaps < circle_cfg.negative_overlap
    scales = jnp.sqrt(overlaps * pos.astype(overlaps.dtype))
    return pos, neg, scales


@dataclasses.dataclass(frozen=True)
class FineLossConfig:
    positive_radius_3d: float = 0.0375
    negative_radius_3d: float = 0.1
    positive_radius_2d: float = 8.0
    negative_radius_2d: float = 12.0
    circle: CircleLossConfig = CircleLossConfig()


def fine_matching_loss(
    img_feats,        # [M, C] features of sampled GT pixel correspondences
    img_points,       # [M, 3] back-projected points of those pixels (cam frame)
    img_pixels,       # [M, 2]
    pcd_feats,        # [M, C] features of the matched cloud points
    pcd_points_cam,   # [M, 3] cloud points mapped into camera frame
    pcd_pixels,       # [M, 2] rendered pixels of the cloud points
    valid,            # [M]
    cfg: FineLossConfig,
):
    """Fine circle loss on sampled GT pixel<->point pairs (reference
    FineMatchingLoss, loss.py:128-215): positives within BOTH the 3D and 2D
    radii, negatives outside EITHER negative radius, circle loss over raw
    feature distances."""
    d3 = pairwise_distance(img_points, pcd_points_cam, squared=False)
    d2 = pairwise_distance(img_pixels, pcd_pixels, squared=False)
    v = valid[:, None] & valid[None, :]
    pos = (d3 < cfg.positive_radius_3d) & (d2 < cfg.positive_radius_2d) & v
    neg = ((d3 > cfg.negative_radius_3d) | (d2 > cfg.negative_radius_2d)) & v
    # reference uses SQUARED distances of (normalized) features here
    # (loss.py:205 pairwise_distance(..., normalized=False) -> squared)
    fdist = pairwise_distance(img_feats, pcd_feats, squared=True)
    loss = circle_loss(fdist, pos, neg, cfg.circle,
                       row_valid=valid, col_valid=valid)

    # matching recall: fraction of rows with a positive whose feature-NN is one
    has_pos = pos.sum(-1) > 0
    nn_idx = jnp.argmin(jnp.where(v, fdist, jnp.inf), axis=-1)
    hit = jnp.take_along_axis(pos, nn_idx[:, None], axis=1)[:, 0]
    recall = (hit & has_pos).sum() / jnp.maximum(has_pos.sum(), 1)
    return loss, recall


def scatter_overlaps(src, tgt, values, valid, n, m):
    """Scatter padded (node, patch, value) pair lists to a dense [N, M]
    matrix (reference loss.py:40-47 index assignment)."""
    def one(s, t, v, ok):
        mat = jnp.zeros((n, m), values.dtype)
        return mat.at[jnp.where(ok, s, n), jnp.where(ok, t, m)].set(v, mode="drop")

    return jax.vmap(one)(src, tgt, values, valid)


def fine_loss_from_batch(outputs, batch, cfg: FineLossConfig):
    """Gather fine GT pairs from the batch and run the fine circle loss
    (reference FineMatchingLoss.forward, loss.py:158-215): image features
    at the GT pixels, point features at the GT indices, cloud points mapped
    into the camera frame and rendered to pixels."""
    from ..ops.vision import render

    img_feats_f = outputs["img_feats_f"]    # [B, H, W, C]
    pcd_feats_f = outputs["pcd_feats_f"]    # [B, N0, C]
    b, h, w, c = img_feats_f.shape

    def norm(x):
        return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8, None)

    def one(imf, pcf, img_points, pts0, tfm, K, pix, pidx, valid):
        img_sel_feats = norm(imf[pix[:, 0], pix[:, 1]])
        img_sel_points = img_points[pix[:, 0] * w + pix[:, 1]]
        pcd_sel_feats = norm(pcf[pidx])
        pts_cam = pts0 @ tfm[:3, :3].T + tfm[:3, 3]
        pcd_sel_points = pts_cam[pidx]
        pcd_sel_pixels, _, _ = render(pcd_sel_points, K, rounding=False)
        return fine_matching_loss(
            img_sel_feats, img_sel_points, pix.astype(jnp.float32),
            pcd_sel_feats, pcd_sel_points, pcd_sel_pixels, valid, cfg)

    losses, recalls = jax.vmap(one)(
        img_feats_f, pcd_feats_f, batch.img_points, batch.points[0],
        batch.transform, batch.intrinsics,
        batch.fine_pixels, batch.fine_pcd_idx, batch.fine_valid)
    return jnp.mean(losses), jnp.mean(recalls)


def loss_2d3d(outputs, circle_cfg: CircleLossConfig, focal_cfg: LossConfig,
              batch=None, fine_cfg: FineLossConfig | None = None,
              weight_coarse: float = 1.0, weight_fine: float = 1.0):
    """Total 2D-3D training loss for one batch.

    Reference parity (OverallLoss, loss.py:226-238): the total is
    ``weight_c * (circle + gt_hat_focal) + weight_f * fine``; the plain
    focal on conf_matrix_pred is computed for logging only (the reference
    computes but does not include it). Circle-loss positives AND negatives
    both come from the MIN overlap ratio (positives > positive_overlap,
    sqrt-scaled; negatives < negative_overlap): the reference aliases
    gt_node_corr_max_overlaps to the min overlaps (loss.py:36), and we
    preserve that numeric behavior. When the batch lacks overlap pairs, the
    binary GT matrix is used instead (degraded mode, synthetic tests only).
    """
    matrix_gt = outputs["matrix_gt"]
    valid = outputs["node_masks"][:, :, None] & outputs["img_valid_c"][:, None, :]
    n, m = matrix_gt.shape[1], matrix_gt.shape[2]

    if batch is not None and getattr(batch, "ov_valid", None) is not None:
        min_ov = scatter_overlaps(batch.ov_src, batch.ov_tgt, batch.ov_min,
                                  batch.ov_valid, n, m)
    else:
        min_ov = matrix_gt

    def one(pcd_f, img_f, mn, nm, iv):
        dists = normalized_feat_dists(pcd_f, img_f)
        pos = mn > circle_cfg.positive_overlap
        scales = jnp.sqrt(mn * pos.astype(mn.dtype))
        # NOTE reference quirk preserved: loss.py:36 aliases
        # gt_node_corr_max_overlaps to the MIN overlaps, so negatives are
        # `min_overlap < negative_overlap` — NOT the true max overlap.
        neg = mn < circle_cfg.negative_overlap
        v = nm[:, None] & iv[None, :]
        return circle_loss(dists, pos & v, neg & v, circle_cfg, scales,
                           row_valid=nm, col_valid=iv)

    l_circle = jnp.mean(jax.vmap(one)(
        outputs["pcd_feats_c"], outputs["img_feats_c"], min_ov,
        outputs["node_masks"], outputs["img_valid_c"]))

    l_focal = focal_correspondence_loss(
        outputs["conf_matrix_pred"], matrix_gt, valid, focal_cfg)
    l_gt_hat = focal_correspondence_loss(
        outputs["conf_matrix_gt_hat"], matrix_gt, valid, focal_cfg)

    info = {"circle": l_circle, "focal": l_focal, "gt_hat": l_gt_hat}
    total = weight_coarse * (l_circle + l_gt_hat)
    if fine_cfg is not None and batch is not None \
            and getattr(batch, "fine_valid", None) is not None:
        l_fine, f_recall = fine_loss_from_batch(outputs, batch, fine_cfg)
        total = total + weight_fine * l_fine
        info.update({"fine": l_fine, "fine_recall": f_recall})
    info["loss"] = total
    return total, info
