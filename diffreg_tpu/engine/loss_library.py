"""vision3d loss library — masked/static-shape JAX twins.

Re-implements the general-purpose losses in ``vision3d/loss/`` (reference
Diff-Reg-2d3d) that are not on the Diff-Reg live path but belong to the
framework surface a vision3d user expects:

  * chamfer_distance_loss     (chamfer_distance.py:10-72)
  * sigmoid_focal_loss(+logits)  (focal_loss.py:10-97)
  * hardest_contrastive_loss  (hardest_contrastive_loss.py:16-92)
  * orthogonal_loss           (orthogonal_loss.py:9-28)
  * smooth_cross_entropy_loss (smooth_ce_loss.py:6-29)
  * rotation/translation/transformation_loss (transformation_loss.py:8-74)
  * weighted_bce_loss(+logits)   (weighted_bce_loss.py:7-63)
  * as_rigid_as_possible_loss (as_rigid_as_possible_loss.py:9-37)

All are pure jittable functions over fixed-shape arrays; ragged selections
become boolean masks with where-sums (TPU/XLA-friendly). The Diff-Reg live
losses (MatchMotionLoss, circle loss) live in losses.py / losses2d3d.py.

Documented divergence: the reference chamfer masking is self-inconsistent —
it infs-out rows where ``src_masks`` is True *and then selects exactly those
rows* for the mean (chamfer_distance.py:44-61), so any masked call returns
inf/nan. Here ``src_mask``/``tgt_mask`` mean valid=True with the evidently
intended semantics: invalid entries never act as neighbors and never count
in the mean.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.vision import pairwise_distance

_BIG = 1e10


def _reduce(x, mask, reduction):
    """Masked reduction over all axes; mask=None means all-valid."""
    if reduction == "none":
        return x if mask is None else jnp.where(mask, x, 0.0)
    if mask is None:
        return jnp.mean(x) if reduction == "mean" else jnp.sum(x)
    total = jnp.sum(jnp.where(mask, x, 0.0))
    if reduction == "sum":
        return total
    return total / jnp.maximum(jnp.sum(mask), 1)


def chamfer_distance_loss(
    src_points,
    tgt_points,
    src_mask=None,
    tgt_mask=None,
    squared: bool = False,
    truncate: Optional[float] = None,
    reduction: str = "mean",
):
    """(Truncated) chamfer distance between two (batched) point sets.

    Args:
      src_points: [*, N, 3]; tgt_points: [*, M, 3].
      src_mask/tgt_mask: optional [*, N]/[*, M] validity (True = real point).
      squared: use squared distances (truncate compares against truncate**2).
      truncate: drop nearest-neighbor distances >= truncate from the mean.
      reduction: 'mean' (per-direction masked mean, reference semantics,
        chamfer_distance.py:63-69) | 'sum'.

    Matches chamfer_distance.py:10-72 with the mask fix documented above.
    """
    d = pairwise_distance(src_points, tgt_points, squared=True)
    if not squared:
        d = jnp.sqrt(jnp.clip(d, 1e-12, None))
    if src_mask is not None:
        d = jnp.where(src_mask[..., :, None], d, _BIG)
    if tgt_mask is not None:
        d = jnp.where(tgt_mask[..., None, :], d, _BIG)

    src_nn = jnp.min(d, axis=-1)   # [*, N]
    tgt_nn = jnp.min(d, axis=-2)   # [*, M]
    src_valid = src_mask if src_mask is not None else jnp.ones(src_nn.shape, bool)
    tgt_valid = tgt_mask if tgt_mask is not None else jnp.ones(tgt_nn.shape, bool)
    if truncate is not None:
        thr = truncate ** 2 if squared else truncate
        src_valid = src_valid & (src_nn < thr)
        tgt_valid = tgt_valid & (tgt_nn < thr)
    return _reduce(src_nn, src_valid, reduction) + _reduce(tgt_nn, tgt_valid, reduction)


def _bce(p, targets, eps=1e-7):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def _bce_with_logits(logits, targets):
    # numerically stable log-sigmoid formulation
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(inputs, targets, alpha: float = -1, gamma: float = 2,
                       reduction: str = "none", mask=None):
    """Focal loss on probabilities (focal_loss.py:10-49; FVCore formula)."""
    ce = _bce(inputs, targets)
    p_t = inputs * targets + (1.0 - inputs) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1.0 - alpha) * (1.0 - targets)) * loss
    return _reduce(loss, mask, reduction)


def sigmoid_focal_loss_with_logits(inputs, targets, alpha: float = -1,
                                   gamma: float = 2, reduction: str = "none",
                                   mask=None):
    """Focal loss on logits (focal_loss.py:52-97)."""
    p = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1.0 - alpha) * (1.0 - targets)) * loss
    return _reduce(loss, mask, reduction)


def weighted_bce_loss(inputs, targets, reduction: str = "mean", mask=None):
    """BCE with detached positive/negative class balancing
    (weighted_bce_loss.py:7-33): weight = targets*(1-mean) + (1-targets)*mean.
    """
    neg_w = _reduce(targets, mask, "mean")
    pos_w = 1.0 - neg_w
    w = jax.lax.stop_gradient(targets * pos_w + (1.0 - targets) * neg_w)
    return _reduce(w * _bce(inputs, targets), mask, reduction)


def weighted_bce_loss_with_logits(inputs, targets, reduction: str = "mean", mask=None):
    """weighted_bce_loss over logits (weighted_bce_loss.py:36-63)."""
    neg_w = _reduce(targets, mask, "mean")
    pos_w = 1.0 - neg_w
    w = jax.lax.stop_gradient(targets * pos_w + (1.0 - targets) * neg_w)
    return _reduce(w * _bce_with_logits(inputs, targets), mask, reduction)


def orthogonal_loss(inputs, targets=None, reduction: str = "mean"):
    """|| R^T R* - I ||^2 elementwise-mse (orthogonal_loss.py:9-28);
    targets=None measures distance of R itself from identity."""
    r = inputs if targets is None else jnp.swapaxes(inputs, -1, -2) @ targets
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), r.shape)
    return _reduce((r - eye) ** 2, None, reduction)


def rotation_loss(estimated_rotations, gt_rotations):
    """MSE of R_est^T R_gt against identity (transformation_loss.py:8-20)."""
    return orthogonal_loss(estimated_rotations, gt_rotations, reduction="mean")


def translation_loss(estimated_translations, gt_translations):
    """MSE over translations (transformation_loss.py:23-34)."""
    return jnp.mean((estimated_translations - gt_translations) ** 2)


def transformation_loss(est_rotations, est_translations, gt_rotations,
                        gt_translations, weight_r: float = 1.0, weight_t: float = 1.0):
    """Weighted rotation + translation loss (transformation_loss.py:37-74).

    The reference takes [B,4,4] transforms; here the (R, t) pair is the
    repo-wide pose representation. Returns (loss, r_loss, t_loss).
    """
    r_loss = rotation_loss(est_rotations, gt_rotations)
    t_loss = translation_loss(est_translations, gt_translations)
    return weight_r * r_loss + weight_t * t_loss, r_loss, t_loss


def smooth_cross_entropy_loss(inputs, targets, eps: float = 0.1):
    """Label-smoothed CE (smooth_ce_loss.py:6-29).

    Args:
      inputs:  [B, C, *] logits; targets: [B, *] int labels.
    """
    num_classes = inputs.shape[1]
    logp = jax.nn.log_softmax(inputs, axis=1)
    one_hot = jax.nn.one_hot(targets, num_classes, axis=1, dtype=logp.dtype)
    smoothed = one_hot * (1.0 - eps) + eps / num_classes
    return -jnp.mean(jnp.sum(smoothed * logp, axis=1))


def hardest_contrastive_loss(
    feats0,
    feats1,
    pos_pairs,
    pos_pair_mask,
    pos_thresh: float,
    neg_thresh: float,
    mask0=None,
    mask1=None,
):
    """Hardest-in-batch contrastive loss (hardest_contrastive_loss.py:16-92).

    Static-shape port: the reference subsamples ``num_pos_pairs`` anchors and
    ``num_candidates`` negatives with host RNG; here the caller passes
    fixed-size index tables (pad + mask) and every point is a candidate
    (num_candidates = N, the exhaustive-hardest variant). The "is this
    candidate actually a positive?" exclusion uses the pair list directly
    instead of the reference's host-side hash of (i, j) keys.

    Args:
      feats0/feats1: [N, C]/[M, C] L2-normalized descriptors.
      pos_pairs:     [P, 2] int (index into feats0, feats1), padded.
      pos_pair_mask: [P] validity of each pair row.
      mask0/mask1:   optional [N]/[M] point validity (True = real).

    Returns dict(loss, pos_loss, neg_loss).
    """
    i0 = pos_pairs[:, 0]
    i1 = pos_pairs[:, 1]
    a0 = feats0[i0]                       # [P, C]
    a1 = feats1[i1]

    pos_d = jnp.linalg.norm(a0 - a1, axis=-1)
    pos_loss = _reduce(jnp.maximum(pos_d - pos_thresh, 0.0) ** 2,
                       pos_pair_mask, "mean")

    n, m = feats0.shape[0], feats1.shape[0]
    # positive-pair exclusion matrix restricted to anchor rows: candidate j
    # is excluded for anchor row p if (i0[p], j) is any valid positive pair.
    # Scatter True only for VALID pairs (padded rows write a sentinel row:
    # .set with duplicate indices picks an arbitrary winner, so a padded
    # (0, 0) row could otherwise erase a real positive at (0, 0))
    safe_i0 = jnp.where(pos_pair_mask, i0, n)
    pos0 = jnp.zeros((n + 1, m), bool).at[safe_i0, i1].set(True)[:n]

    d0 = jnp.sqrt(jnp.clip(pairwise_distance(a0, feats1, squared=True), 1e-12, None))  # [P, M]
    d1 = jnp.sqrt(jnp.clip(pairwise_distance(a1, feats0, squared=True), 1e-12, None))  # [P, N]
    bad0 = pos0[i0]                       # [P, M] positives of each anchor
    bad1 = pos0[:, i1].T                  # [P, N]
    if mask1 is not None:
        bad0 = bad0 | ~mask1[None, :]
    if mask0 is not None:
        bad1 = bad1 | ~mask0[None, :]
    d0 = jnp.where(bad0, _BIG, d0)
    d1 = jnp.where(bad1, _BIG, d1)
    nn0 = jnp.min(d0, axis=1)
    nn1 = jnp.min(d1, axis=1)
    # a row whose hardest negative was a positive/invalid (nn == BIG)
    # contributes ReLU(neg_thresh - BIG) = 0, like the reference's neg mask
    neg0 = _reduce(jnp.maximum(neg_thresh - nn0, 0.0) ** 2, pos_pair_mask, "mean")
    neg1 = _reduce(jnp.maximum(neg_thresh - nn1, 0.0) ** 2, pos_pair_mask, "mean")
    neg_loss = 0.5 * (neg0 + neg1)
    return {"loss": pos_loss + neg_loss, "pos_loss": pos_loss, "neg_loss": neg_loss}


def as_rigid_as_possible_loss(nodes, rotations, translations, edge_indices,
                              edge_weights=None, edge_mask=None):
    """ARAP regularizer over a deformation graph
    (as_rigid_as_possible_loss.py:9-37).

    Args:
      nodes:        [V, 3] graph nodes.
      rotations:    [V, 3, 3] per-node rotations.
      translations: [V, 3] per-node translations.
      edge_indices: [E, 2] (anchor, reference) node ids, padded.
      edge_weights: optional [E].
      edge_mask:    optional [E] validity of padded edges.
    """
    anc = edge_indices[:, 0]
    ref = edge_indices[:, 1]
    anc_nodes = nodes[anc]
    ref_nodes = nodes[ref]
    # warp ref through anchor's transform about the anchor node
    rel = ref_nodes - anc_nodes
    warped = jnp.einsum("eij,ej->ei", rotations[anc], rel) \
        + translations[anc] + anc_nodes
    target = ref_nodes + translations[ref]
    vals = jnp.sum((warped - target) ** 2, axis=-1)
    if edge_weights is not None:
        vals = vals * edge_weights
    return _reduce(vals, edge_mask, "mean")


def p2p_fitting_regularizer(intermediates, fitting_power: float = 1.0,
                            repulse_extent: float = 1.2):
    """Deformed-kernel-point regularizer for deformable KPConv layers.

    The reference's deformable KPConv stores ``min_d2`` / ``deformed_KP``
    on the module "(used in regularization loss)"
    (Diff-Reg-3dmatch/models/blocks.py:154-157, 280-281); the loss those
    running variables feed is KPConv's point-to-point fitting regularizer:
    per deformable conv,

      * fitting: mean(min_d2 / KP_extent^2) pulls every deformed kernel
        point toward its nearest input point;
      * repulsive: sum over ordered kernel-point pairs (i, j!=i) of
        clamp_max(||kp_i - kp_j||/extent - repulse_extent, 0)^2 / K,
        averaged over queries, with the *other* point detached — pushes
        coincident deformed points apart.

    Args:
      intermediates: the flax ``intermediates`` collection from
        ``model.apply(..., mutable=["intermediates"])`` — every
        ``deform_aux`` sown by a deformable :class:`KPConvLayer` is
        consumed (the flax twin of iterating ``net.modules()``). Padded
        query rows are excluded via the sown ``q_mask``.
      fitting_power: ``deform_fitting_power`` (loss scale).
      repulse_extent: normalized repulsion radius.

    Returns a scalar: ``fitting_power * (fitting + repulsive)`` summed over
    deformable convs; 0.0 if the network has none.
    """
    auxes = []

    def collect(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "deform_aux":
                    # sown values are tuples (one entry per sow call)
                    auxes.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    collect(v)

    collect(intermediates)
    if not auxes:
        return jnp.asarray(0.0, jnp.float32)

    total = jnp.asarray(0.0, jnp.float32)
    for aux in auxes:
        extent = aux["kp_extent"]
        m = aux["q_mask"].astype(jnp.float32)              # [B, Nq] (or [Nq])
        denom = jnp.maximum(jnp.sum(m), 1.0)
        # fitting — l1(min_d2/extent^2, 0) == masked mean over queries AND
        # kernel points
        fit_q = jnp.mean(aux["min_d2"], axis=-1) / extent**2
        total = total + jnp.sum(fit_q * m) / denom

        kp = aux["deformed_kp"] / extent                    # [B, Nq, P, 3]
        p = kp.shape[-2]
        diff = kp[..., :, None, :] - jax.lax.stop_gradient(kp[..., None, :, :])
        sq = jnp.sum(diff * diff, axis=-1)                  # [B, Nq, P, P]
        eye = jnp.eye(p, dtype=bool)
        dist = jnp.sqrt(jnp.where(eye, 1.0, sq))            # diag sqrt-safe
        pen = jnp.minimum(dist - repulse_extent, 0.0) ** 2
        pen = jnp.where(eye, 0.0, pen)
        rep_q = jnp.sum(pen, axis=(-1, -2)) / p             # [B, Nq]
        total = total + jnp.sum(rep_q * m) / denom
    return fitting_power * total
