"""Training losses + match metrics — masked, static-shape.

Re-implements MatchMotionLoss (Diff-Reg-3dmatch/models/loss.py:47-175):
focal correspondence loss on the Sinkhorn confidence matrix (pos+neg terms),
the same loss on the denoised matrix ``conf_matrix_gt_hat``, an optional L1
warped-flow motion loss, and recall/precision logging. All reductions count
only valid (non-padded) entries, which reproduces the reference exactly at
its batch_size=1 (where no padding exists).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    motion_weight: float = 0.0
    match_weight: float = 1.0
    match_type: str = "sinkhorn"
    dataset: str = "3dmatch"


def focal_correspondence_loss(conf, conf_gt, valid, cfg: LossConfig):
    """Focal loss over the matching matrix (loss.py:273-315).

    conf, conf_gt: [B, S, T]; valid: [B, S, T] bool region mask.
    Sinkhorn variant: pos term on GT entries, neg term on valid non-GT
    entries. Means are over the respective masked sets.
    """
    conf = jnp.clip(conf, 1e-6, 1.0 - 1e-6)
    pos = (conf_gt > 0.5) & valid
    neg = (conf_gt <= 0.5) & valid

    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    loss_pos_el = -alpha * (1.0 - conf) ** gamma * jnp.log(conf)
    n_pos = jnp.maximum(pos.sum(), 1)
    loss_pos = jnp.sum(jnp.where(pos, loss_pos_el, 0.0)) / n_pos

    if cfg.match_type == "dual_softmax":
        return cfg.pos_weight * loss_pos

    loss_neg_el = -alpha * conf**gamma * jnp.log(1.0 - conf)
    n_neg = jnp.maximum(neg.sum(), 1)
    loss_neg = jnp.sum(jnp.where(neg, loss_neg_el, 0.0)) / n_neg
    # zero out the pos term when the batch has no GT matches (reference
    # corner case, loss.py:286-290)
    has_pos = (pos.sum() > 0).astype(conf.dtype)
    return cfg.pos_weight * loss_pos * has_pos + cfg.neg_weight * loss_neg


def match_recall_precision(conf_gt, pred_mask):
    """Recall/precision of a predicted match mask vs the GT matrix
    (loss.py:324-343, mask-based instead of index lists)."""
    gt = conf_gt > 0.5
    tp = (pred_mask & gt).sum()
    recall = tp / jnp.maximum(gt.sum(), 1)
    precision = tp / jnp.maximum(pred_mask.sum(), 1)
    return recall, precision


def motion_l1_loss(s_pcd, rotation_pred, translation_pred, rot_gt, trn_gt,
                   overlap_mask, coarse_flow=None):
    """L1 between predicted and GT warped source flow on overlap points
    (loss.py:113-132). coarse_flow deforms the source first for 4DMatch."""
    pred_warp = s_pcd @ jnp.swapaxes(rotation_pred, 1, 2) + jnp.swapaxes(translation_pred, 1, 2)
    sflow_pred = pred_warp - s_pcd
    base = s_pcd + coarse_flow if coarse_flow is not None else s_pcd
    gt_warp = base @ jnp.swapaxes(rot_gt, 1, 2) + jnp.swapaxes(trn_gt, 1, 2)
    sflow_gt = gt_warp - s_pcd
    e1 = jnp.sum(jnp.abs(sflow_pred - sflow_gt), axis=2)  # [B, S]
    n = jnp.maximum(overlap_mask.sum(), 1)
    return jnp.sum(jnp.where(overlap_mask, e1, 0.0)) / n


def diffreg_loss(outputs, batch, cfg: LossConfig):
    """Total training loss (loss.py:80-175): focal(pred) + focal(gt_hat)
    [+ motion L1]. Returns (loss, info dict)."""
    valid = batch.src_mask[:, :, None] & batch.tgt_mask[:, None, :]
    matrix_gt = outputs["matrix_gt"]

    focal_coarse = focal_correspondence_loss(
        outputs["conf_matrix_pred"], matrix_gt, valid, cfg)
    recall, precision = match_recall_precision(matrix_gt, outputs["match_mask_pred"])

    loss = cfg.match_weight * focal_coarse
    info = {
        "focal_coarse": focal_coarse,
        "recall_coarse": recall,
        "precision_coarse": precision,
    }

    if cfg.motion_weight > 0:
        # overlap mask: src rows that appear in the GT correspondences
        overlap = (matrix_gt.sum(axis=2) > 0) & batch.src_mask
        flow = batch.coarse_flow if cfg.dataset == "4dmatch" else None
        l1 = motion_l1_loss(
            outputs["s_pcd"], outputs["rotation_pred"], outputs["translation_pred"],
            batch.rot_gt, batch.trn_gt, overlap, flow)
        # reference gates the motion loss on recall > 0.01 (loss.py:113)
        gate = (recall > 0.01).astype(l1.dtype)
        loss = loss + cfg.motion_weight * l1 * gate
        info["l1_motion"] = l1

    loss_gt_hat = focal_correspondence_loss(
        outputs["conf_matrix_gt_hat"], matrix_gt, valid, cfg)
    loss = loss + loss_gt_hat
    info["loss_matrix_gt_hat"] = loss_gt_hat
    info["loss"] = loss
    return loss, info
