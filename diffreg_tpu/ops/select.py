"""Match-selection ops: mutual top-k, thresholded mutual-argmax, padded extraction.

TPU-native replacements for the boolean-indexing extraction the reference
uses (torch.nonzero at matching.py:55,139). On TPU a "list of matches" is a
fixed-size buffer [MAX_CORR] of (row, col, score) plus a validity mask; the
buffer is filled by top-k over the flattened masked score matrix so results
are deterministic and shape-static.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .masked import NEG_INF


class Correspondences(NamedTuple):
    src_idx: jnp.ndarray  # [..., K] int32
    tgt_idx: jnp.ndarray  # [..., K] int32
    scores: jnp.ndarray   # [..., K]
    valid: jnp.ndarray    # [..., K] bool


def mutual_topk_mask(score_mat, k, largest=True, threshold=None, mutual=True):
    """Boolean correspondence matrix via (mutual) top-k of rows and columns.

    Mirrors reference mutual_topk_select (pipeline.py:12-65) with
    ``reduce_result=False``: entries that are in the row top-k AND/OR the
    column top-k, optionally thresholded.

    Args:
      score_mat: [N, M] (unbatched; vmap for batches).
    """
    s = score_mat if largest else -score_mat
    n, m = s.shape

    row_kth = jax.lax.top_k(s, k)[0][:, -1:]           # [N, 1]
    col_kth = jax.lax.top_k(s.T, k)[0][:, -1:].T        # [1, M]
    row_in = s >= row_kth
    col_in = s >= col_kth

    corr = (row_in & col_in) if mutual else (row_in | col_in)

    if threshold is not None:
        gate = (score_mat > threshold) if largest else (score_mat < threshold)
        corr = corr & gate
    return corr


def extract_correspondences(corr_mat, score_mat, max_corr):
    """Turn a boolean correspondence matrix into a fixed-size index list.

    Selected entries are returned in decreasing score order; slots beyond the
    number of selected entries have valid=False.
    """
    n, m = score_mat.shape
    masked = jnp.where(corr_mat, score_mat, NEG_INF)
    flat = masked.reshape(-1)
    from .topk import fast_top_k

    scores, idx = fast_top_k(flat, max_corr)
    valid = jnp.take(corr_mat.reshape(-1), idx)
    return Correspondences(
        (idx // m).astype(jnp.int32),
        (idx % m).astype(jnp.int32),
        jnp.where(valid, scores, 0.0),
        valid,
    )


def mutual_topk_correspondences(score_mat, k, max_corr, largest=True, threshold=None, mutual=True):
    corr = mutual_topk_mask(score_mat, k, largest, threshold, mutual)
    return extract_correspondences(corr, score_mat, max_corr)


def thresholded_mutual_argmax_mask(conf_matrix, thr=0.0, mutual=True):
    """Reference ``Matching.get_match`` (matching.py:126-143): conf > thr,
    optionally ANDed with being the row-argmax and column-argmax.

    Args:
      conf_matrix: [B, N, M].
    """
    mask = conf_matrix > thr
    if mutual:
        row_max = jnp.max(conf_matrix, axis=2, keepdims=True)
        col_max = jnp.max(conf_matrix, axis=1, keepdims=True)
        mask = mask & (conf_matrix == row_max) & (conf_matrix == col_max)
    return mask


def superpoint_proposals(src_idx, tgt_idx, overlaps, valid, num_proposals, rng,
                         overlap_threshold=0.3, decay_step=0.05,
                         probabilistic=False):
    """GT superpoint-proposal selection — SuperPointProposalGenerator twin
    (vision3d/models/geotransformer/superpoint_proposal.py:8-56; the
    reference 2d3d model instantiates it at model.py:233).

    Static-shape version of the reference's loop: the overlap threshold
    decays by ``decay_step`` until at least one candidate passes (computed
    as a vectorized minimum decay count, not a Python loop), then
    ``num_proposals`` candidates are drawn without replacement — uniformly,
    or overlap-weighted when ``probabilistic``.

    Args:
      src_idx/tgt_idx: [N] padded GT correspondence indices.
      overlaps: [N] overlap ratios; valid: [N] bool.
      rng: jax PRNG key.

    Returns (src [P], tgt [P], overlaps [P], valid [P]).
    """
    import jax

    ov = jnp.where(valid, overlaps, -jnp.inf)
    # smallest k with max(ov) > thr - k*decay (strict >, like the reference
    # loop): k = 0 when already passing, else floor((thr - max)/decay) + 1
    max_ov = jnp.max(ov)
    k = jnp.where(max_ov > overlap_threshold, 0.0,
                  jnp.floor((overlap_threshold - max_ov) / decay_step) + 1.0)
    thr = overlap_threshold - k * decay_step
    mask = ov > thr

    # weighted sample without replacement via Gumbel top-k on log-weights
    if probabilistic:
        logw = jnp.where(mask, jnp.log(jnp.clip(ov, 1e-12, None)), -jnp.inf)
    else:
        logw = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(rng, logw.shape)
    scores = logw + g
    _, sel = jax.lax.top_k(scores, num_proposals)
    sel_valid = jnp.take(mask, sel)
    return (jnp.take(src_idx, sel), jnp.take(tgt_idx, sel),
            jnp.take(overlaps, sel), sel_valid)
