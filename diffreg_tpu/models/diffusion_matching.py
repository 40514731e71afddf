"""Diff-Reg pipeline: diffusion-based correspondence search, TPU-native.

Re-architecture of the reference ``Pipeline`` (Diff-Reg-3dmatch/models/
pipeline.py:130-379 and the 4dmatch twin):

  * the whole DDIM reverse loop — min-shift, Sinkhorn projection, on-device
    soft-Procrustes warp, 6-layer denoising transformer, matcher, DDIM
    update — is ONE ``lax.scan`` over (t, t_next) pairs, jitted end to end.
    The reference executes this loop in Python with a host-CPU float64 SVD
    every step (procrustes.py:35-36);
  * variant differences (SURVEY.md §2.1 "4DMatch branch deltas") are config
    flags: training noise model, stochastic vs deterministic DDIM update,
    final prediction head (Sinkhorn matrix vs sigmoid);
  * batch axis everywhere: many pairs per chip, one compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion.schedule import (
    DiffusionSchedule,
    ddim_time_pairs,
    make_schedule,
    predict_noise_from_start,
    q_sample,
    signed_fractional_noise,
)
from ..geometry.procrustes import soft_procrustes
from ..nn.kpfcn import KPFCN, KPFCNConfig
from ..nn.matching import Matching, MatchingConfig
from ..nn.transformer import ProcrustesConfig, RepositioningTransformer, TransformerConfig
from ..ops.select import mutual_topk_mask


def masked_min(x, src_mask, tgt_mask):
    """Per-element min of x over VALID entries only, keepdims.

    The reference computes ``x - x.min()`` over a matrix with no padding
    (pipeline.py:210,239,264 at B=1); with our static padding the padded
    entries of x evolve freely through the DDIM algebra and must not leak
    into the shift.
    """
    valid = src_mask[:, :, None] & tgt_mask[:, None, :]
    return jnp.min(jnp.where(valid, x, jnp.inf), axis=(1, 2), keepdims=True)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    kpfcn: KPFCNConfig
    coarse_transformer: TransformerConfig
    coarse_matching: MatchingConfig
    procrustes: ProcrustesConfig
    denoising_layer_types: Tuple[str, ...] = ("self", "cross") * 3
    timesteps: int = 1000
    sample_steps: int = 20                 # SAMPLE_STEP
    ddim_eta: float = 1.0
    variant: str = "3dmatch"               # 3dmatch | 4dmatch
    coarse_level: int = -2

    @property
    def stochastic_ddim(self) -> bool:
        """4dmatch keeps the +sigma*noise DDIM term the 3dmatch branch drops
        (3dmatch pipeline.py:256 vs 4dmatch pipeline.py:190)."""
        return self.variant == "4dmatch"


class DiffusionMatchingModel(nn.Module):
    cfg: PipelineConfig

    def setup(self):
        cfg = self.cfg
        self.backbone = KPFCN(cfg.kpfcn)
        self.coarse_transformer = RepositioningTransformer(cfg.coarse_transformer)
        self.coarse_matching = Matching(cfg.coarse_matching)
        denoise_tf_cfg = dataclasses.replace(
            cfg.coarse_transformer, layer_types=cfg.denoising_layer_types)
        self.denoising_transformer = RepositioningTransformer(denoise_tf_cfg)
        self.denoising_matching = Matching(cfg.coarse_matching)
        self.schedule: DiffusionSchedule = make_schedule(cfg.timesteps)

    # ------------------------------------------------------------------ #
    # shared pieces
    # ------------------------------------------------------------------ #

    def encode(self, batch):
        """Backbone + coarse split (pipeline.py:164-177, split_feats:350-379).

        Returns (src_feats, tgt_feats, s_pcd, t_pcd) all padded [B, S|T, .].
        """
        pyr = {
            "points": batch.points, "masks": batch.masks,
            "neighbors": batch.neighbors, "pools": batch.pools,
            "upsamples": batch.upsamples, "features": batch.features,
        }
        coarse_feats = self.backbone(pyr, phase="coarse")  # [B, Nc, C]
        level = self.cfg.coarse_level % len(batch.points)
        coarse_pts = batch.points[level]                   # [B, Nc, 3]

        def gather_rows(arr, idx):
            # sentinel index Nc -> zero row
            zero = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
            padded = jnp.concatenate([arr, zero], axis=0)
            return padded[idx]

        src_feats = jax.vmap(gather_rows)(coarse_feats, batch.src_idx_coarse)
        tgt_feats = jax.vmap(gather_rows)(coarse_feats, batch.tgt_idx_coarse)
        s_pcd = jax.vmap(gather_rows)(coarse_pts, batch.src_idx_coarse)
        t_pcd = jax.vmap(gather_rows)(coarse_pts, batch.tgt_idx_coarse)
        return src_feats, tgt_feats, s_pcd, t_pcd

    def _warp_from_noisy_matrix(self, x, s_pcd, t_pcd, src_mask, tgt_mask):
        """Sinkhorn-project a noisy matrix, extract a pose, warp the source
        (pipeline.py:293-309). Warp uses the condition-gated pose.

        Static shortcut: with ``max_condition_num <= 0`` the gate rejects
        every solution, so the forward warp is ALWAYS identity (reference
        3DMatch test config, procrustes.py:86-91) — the per-step Sinkhorn
        and the top-k pose solve are dead compute and are skipped entirely.
        This is exact, not an approximation.
        """
        if self.cfg.procrustes.max_condition_num <= 0:
            return s_pcd, t_pcd, None, None
        conf = self.denoising_matching.sinkhorn(x, src_mask, tgt_mask)
        res = soft_procrustes(
            conf, s_pcd, t_pcd, src_mask, tgt_mask,
            sample_rate=self.cfg.procrustes.sample_rate,
            max_condition_num=self.cfg.procrustes.max_condition_num,
            use_masked_lengths=self.cfg.procrustes.use_masked_lengths,
        )
        src_warped = s_pcd @ jnp.swapaxes(res.rotation_fwd, 1, 2) \
            + jnp.swapaxes(res.translation_fwd, 1, 2)
        return src_warped, t_pcd, conf, res

    def _denoise(self, src_feats, tgt_feats, src_warped, t_pcd, src_mask, tgt_mask):
        """Denoising transformer + matcher -> x0 prediction (pipeline.py:213-216)."""
        sf, tf, spe, tpe, _ = self.denoising_transformer(
            src_feats, tgt_feats, src_warped, t_pcd, src_mask, tgt_mask)
        conf, match_mask = self.denoising_matching(
            sf, tf, spe, tpe, src_mask, tgt_mask,
            pe_type=self.cfg.coarse_transformer.pe_type)
        return conf, match_mask

    # ------------------------------------------------------------------ #
    # training branch (pipeline.py:182-219)
    # ------------------------------------------------------------------ #

    def train_forward(self, batch, rng):
        cfg = self.cfg
        src_feats_bb, tgt_feats_bb, s_pcd, t_pcd = self.encode(batch)
        src_mask, tgt_mask = batch.src_mask, batch.tgt_mask
        b, s = src_mask.shape
        t = tgt_mask.shape[1]

        rng_t, rng_noise, rng_pos = jax.random.split(rng, 3)

        # single-pass coarse matcher (the "backbone" result)
        sf, tf, spe, tpe, aux = self.coarse_transformer(
            src_feats_bb, tgt_feats_bb, s_pcd, t_pcd, src_mask, tgt_mask,
            rot_gt=batch.rot_gt, trn_gt=batch.trn_gt, rng=rng_pos)
        conf_pred, match_mask_pred = self.coarse_matching(
            sf, tf, spe, tpe, src_mask, tgt_mask, pe_type=cfg.coarse_transformer.pe_type)
        res = soft_procrustes(
            conf_pred, s_pcd, t_pcd, src_mask, tgt_mask,
            sample_rate=cfg.procrustes.sample_rate,
            max_condition_num=cfg.procrustes.max_condition_num,
            use_masked_lengths=cfg.procrustes.use_masked_lengths,
        )

        # diffusion: noise the GT matrix, denoise it
        matrix_gt = batch.matrix_gt()                       # [B, S, T]
        ts = jax.random.randint(rng_t, (b,), 0, cfg.timesteps)

        if cfg.variant == "4dmatch":
            noise = jax.random.normal(rng_noise, matrix_gt.shape)
            disturbed = jax.nn.sigmoid(q_sample(self.schedule, matrix_gt, ts, noise))
        else:
            noise = signed_fractional_noise(rng_noise, matrix_gt.shape)
            disturbed = q_sample(self.schedule, matrix_gt, ts, noise)
            disturbed = jnp.nan_to_num(disturbed, nan=0.0)
            disturbed = disturbed - masked_min(disturbed, src_mask, tgt_mask)

        src_warped, t_pcd_w, _, _ = self._warp_from_noisy_matrix(
            disturbed, s_pcd, t_pcd, src_mask, tgt_mask)
        conf_gt_hat, match_mask_gt_hat = self._denoise(
            src_feats_bb, tgt_feats_bb, src_warped, t_pcd_w, src_mask, tgt_mask)

        return {
            "s_pcd": s_pcd, "t_pcd": t_pcd,
            "conf_matrix_pred": conf_pred,
            "match_mask_pred": match_mask_pred,
            "rotation_pred": res.rotation, "translation_pred": res.translation,
            "conf_matrix_gt_hat": conf_gt_hat,
            "match_mask_gt_hat": match_mask_gt_hat,
            "matrix_gt": matrix_gt,
            "position_layers": aux["position_layers"],
            "timesteps": ts,
        }

    # ------------------------------------------------------------------ #
    # DDIM sampling branch (pipeline.py:221-284) — one lax.scan
    # ------------------------------------------------------------------ #

    def ddim_sample(self, batch, rng, sample_steps: Optional[int] = None,
                    x_init: Optional[jnp.ndarray] = None,
                    zero_ddim_noise: bool = False):
        """DDIM reverse loop. ``x_init`` overrides the N(0,1) start (parity
        tests / deterministic eval); ``zero_ddim_noise`` drops the stochastic
        +sigma*noise term while keeping sigma inside the DDIM coefficient c,
        exactly what zeroing torch.randn_like would do in the reference
        (4dmatch pipeline.py:190)."""
        cfg = self.cfg
        src_feats_bb, tgt_feats_bb, s_pcd, t_pcd = self.encode(batch)
        src_mask, tgt_mask = batch.src_mask, batch.tgt_mask
        b, s = src_mask.shape
        t = tgt_mask.shape[1]

        steps = int(sample_steps if sample_steps is not None else cfg.sample_steps)
        pairs = jnp.asarray(ddim_time_pairs(cfg.timesteps, steps))  # [steps, 2]

        rng_init, rng_loop = jax.random.split(rng)
        x0_init = jax.random.normal(rng_init, (b, s, t)) if x_init is None else x_init

        def body(mdl, x, scan_in):
            # NOTE: runs under nn.scan — module calls share broadcast params.
            step_idx, time, time_next = scan_in
            if cfg.variant != "4dmatch":
                # per-step min-shift exists only in the 3dmatch loop
                # (3dmatch pipeline.py:239; absent from 4dmatch pipeline.py:160-190)
                x = x - masked_min(x, src_mask, tgt_mask)
            src_warped, t_pcd_w, _, _ = mdl._warp_from_noisy_matrix(
                x, s_pcd, t_pcd, src_mask, tgt_mask)
            x_start, _ = mdl._denoise(
                src_feats_bb, tgt_feats_bb, src_warped, t_pcd_w, src_mask, tgt_mask)

            tvec = jnp.full((b,), time, jnp.int32)
            pred_noise = predict_noise_from_start(mdl.schedule, x, tvec, x_start)

            alpha = mdl.schedule.alphas_cumprod[time]
            alpha_next = mdl.schedule.alphas_cumprod[time_next]
            sigma = cfg.ddim_eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))

            x_new = x_start * jnp.sqrt(alpha_next) + c * pred_noise
            if cfg.stochastic_ddim and not zero_ddim_noise:
                step_rng = jax.random.fold_in(rng_loop, step_idx)
                x_new = x_new + sigma * jax.random.normal(step_rng, x_new.shape)
            return x_new, None

        scan = nn.scan(
            body,
            variable_broadcast=["params", "buffers"],
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        x, _ = scan(self, x0_init, (jnp.arange(steps), pairs[:, 0], pairs[:, 1]))

        if cfg.variant == "4dmatch":
            # final prediction is sigmoid(x); the tester extracts matches with
            # get_match(thr, mutual=True) (4dmatch pipeline.py:192-194)
            conf_pred = jax.nn.sigmoid(x)
            conf_pred = conf_pred * (src_mask[:, :, None] & tgt_mask[:, None, :])
        else:
            sim = x - masked_min(x, src_mask, tgt_mask)
            conf_pred = self.denoising_matching.sinkhorn(sim, src_mask, tgt_mask)

        # match_pred: top-1 from both sides, union (pipeline.py:275-278)
        corr_mask = jax.vmap(
            lambda m: mutual_topk_mask(m, 1, largest=True, threshold=None, mutual=False)
        )(conf_pred)
        corr_mask = corr_mask & src_mask[:, :, None] & tgt_mask[:, None, :]

        res = soft_procrustes(
            conf_pred, s_pcd, t_pcd, src_mask, tgt_mask,
            sample_rate=cfg.procrustes.sample_rate,
            max_condition_num=cfg.procrustes.max_condition_num,
            use_masked_lengths=cfg.procrustes.use_masked_lengths,
        )

        return {
            "s_pcd": s_pcd, "t_pcd": t_pcd,
            "conf_matrix_pred": conf_pred,
            "corr_mask": corr_mask,
            "rotation_pred": res.rotation,
            "translation_pred": res.translation,
        }

    # ------------------------------------------------------------------ #
    # single-pass branch ("Diff-Reg (backbone)" rows in the README tables)
    # ------------------------------------------------------------------ #

    def backbone_forward(self, batch, rng):
        cfg = self.cfg
        src_feats_bb, tgt_feats_bb, s_pcd, t_pcd = self.encode(batch)
        src_mask, tgt_mask = batch.src_mask, batch.tgt_mask
        sf, tf, spe, tpe, aux = self.coarse_transformer(
            src_feats_bb, tgt_feats_bb, s_pcd, t_pcd, src_mask, tgt_mask,
            rot_gt=batch.rot_gt, trn_gt=batch.trn_gt, rng=rng)
        conf_pred, _ = self.coarse_matching(
            sf, tf, spe, tpe, src_mask, tgt_mask, pe_type=cfg.coarse_transformer.pe_type)
        corr_mask = jax.vmap(
            lambda m: mutual_topk_mask(m, 1, largest=True, threshold=None, mutual=False)
        )(conf_pred)
        corr_mask = corr_mask & src_mask[:, :, None] & tgt_mask[:, None, :]
        res = soft_procrustes(
            conf_pred, s_pcd, t_pcd, src_mask, tgt_mask,
            sample_rate=cfg.procrustes.sample_rate,
            max_condition_num=cfg.procrustes.max_condition_num,
            use_masked_lengths=cfg.procrustes.use_masked_lengths,
        )
        return {
            "s_pcd": s_pcd, "t_pcd": t_pcd,
            "conf_matrix_pred": conf_pred,
            "corr_mask": corr_mask,
            "rotation_pred": res.rotation,
            "translation_pred": res.translation,
        }

    def __call__(self, batch, rng, mode: str = "ddim", **kwargs):
        if mode == "train":
            return self.train_forward(batch, rng)
        if mode == "ddim":
            return self.ddim_sample(batch, rng, **kwargs)
        if mode == "backbone":
            return self.backbone_forward(batch, rng)
        raise KeyError(mode)
