"""Matcher head: feature projection + PE + Sinkhorn / dual-softmax (Flax).

Re-implements the reference Matching module (Diff-Reg-3dmatch/models/
matching.py:96-283). Reference behaviors preserved on purpose:

  * ``src_proj`` is applied to BOTH sides — the reference never uses its
    ``tgt_proj`` (matching.py:173-174); the parameter still exists for
    checkpoint parity, gated by ``apply_tgt_proj`` for users who want the fix;
  * features divided by sqrt(C) before the similarity matmul;
  * match extraction returns a *mask*, never a ragged index list — the TPU
    equivalent of ``get_match``'s nonzero() (matching.py:126-143).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import mask_matrix
from ..ops.position_encoding import embed_pos
from ..ops.select import thresholded_mutual_argmax_mask
from ..ops.sinkhorn import dual_softmax_conf_matrix, log_sinkhorn
from ..utils.precision import get_precision


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    feature_dim: int = 432
    match_type: str = "sinkhorn"          # sinkhorn | dual_softmax
    confidence_threshold: float = 0.2
    dsmax_temperature: float = 0.1
    skh_init_bin_score: float = 1.0
    skh_iters: int = 3
    entangled: bool = False
    apply_tgt_proj: bool = False          # False == reference behavior


class Matching(nn.Module):
    cfg: MatchingConfig

    def setup(self):
        self.src_proj = nn.Dense(self.cfg.feature_dim, use_bias=False)
        self.tgt_proj = nn.Dense(self.cfg.feature_dim, use_bias=False)
        if self.cfg.match_type == "sinkhorn":
            self.bin_score = self.param(
                "bin_score", nn.initializers.constant(self.cfg.skh_init_bin_score), ())

    def __call__(self, src_feats, tgt_feats, src_pe, tgt_pe, src_mask, tgt_mask,
                 pe_type="rotary", return_similarity=False,
                 src_pad=None, tgt_pad=None):
        """Returns (conf_matrix [B,S,T], match_mask [B,S,T] bool).

        ``src_pad``/``tgt_pad``: static-padding masks when ``src_mask``/
        ``tgt_mask`` are semantic validity masks (see ops.sinkhorn)."""
        cfg = self.cfg
        src = self.src_proj(src_feats)
        tgt = self.tgt_proj(tgt_feats) if cfg.apply_tgt_proj else self.src_proj(tgt_feats)

        if not cfg.entangled and src_pe is not None:
            # the 2D-3D matcher passes no PE (fused features carry position)
            src = embed_pos(pe_type, src, src_pe)
            tgt = embed_pos(pe_type, tgt, tgt_pe)

        scale = src.shape[-1] ** 0.5
        src = src / scale
        tgt = tgt / scale

        sim = jnp.einsum("bsc,btc->bst", src, tgt, precision=get_precision())
        if cfg.match_type == "dual_softmax":
            conf = dual_softmax_conf_matrix(sim, cfg.dsmax_temperature, src_mask, tgt_mask)
        elif cfg.match_type == "sinkhorn":
            if src_mask is not None:
                sim = mask_matrix(sim, src_mask, tgt_mask)
            z = log_sinkhorn(sim, self.bin_score, cfg.skh_iters, src_mask, tgt_mask,
                             src_pad=src_pad, tgt_pad=tgt_pad)
            conf = jnp.exp(z)[:, :-1, :-1]
        else:
            raise NotImplementedError(cfg.match_type)

        match_mask = thresholded_mutual_argmax_mask(conf, cfg.confidence_threshold, mutual=True)
        if return_similarity:
            return conf, match_mask, sim
        return conf, match_mask

    def sinkhorn(self, scores, src_mask, tgt_mask, src_pad=None, tgt_pad=None):
        """Run the learned-dustbin Sinkhorn on an external score matrix.

        Used by the diffusion pipeline to project a noisy matrix onto the
        doubly-stochastic polytope with THIS matcher's bin_score
        (pipeline.py:293-302 uses denoising_coarse_matching.bin_score).
        """
        scores = mask_matrix(scores, src_mask, tgt_mask)
        z = log_sinkhorn(scores, self.bin_score, self.cfg.skh_iters, src_mask, tgt_mask,
                         src_pad=src_pad, tgt_pad=tgt_pad)
        return jnp.exp(z)[:, :-1, :-1]
