"""2D-3D registration pipeline (RGB-D Scenes V2 / 7Scenes), TPU-native.

Re-architecture of the reference MATR2D3D (Diff-Reg-2d3d/experiments/
2d3dmatr.rgbdv2.stage4.level3.stage1/model.py:160-948):

  image --> ImageBackbone UNet (optionally DINOv2-injected)  --\
  depth --> back_project -> real 3D image points               +-> cross-modal
  pcd   --> PointBackbone KPConv pyramid                     --/    fusion
  coarse matcher (Sinkhorn, learned dustbin) over pcd nodes x image patches;
  diffusion branch: noise the GT matrix, Sinkhorn-project, 3D-3D Procrustes
  warp of the pcd nodes onto (monocular-depth-lifted) image patch centers,
  denoise with a second fusion transformer (model.py:599-694); DDIM at eval.

Differences by design:
  * batched + static shapes (image patch count fixed by H/8 grid; pcd nodes
    padded); the eval DDIM loop is one nn.scan like the 3D pipeline;
  * frozen towers (DINOv2 ViT-L / DepthAnything) run OUTSIDE the training
    graph: the batch carries precomputed `dino_feats` (final patch tokens)
    and the raw `mono_depth` map. The pipeline owns the trainable pieces —
    the dino_2_u projection (model.py:249) and the depth affine
    depth_coffa/b (model.py:273-275) applied in _lift_mono_depth. The
    towers live in diffreg_tpu/nn/{dinov2,depth_anything,encoders}.py with
    weight converters (tools/convert_towers.py); without their released
    weights the config falls back to real-depth patch centers.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion.schedule import (
    DiffusionSchedule,
    ddim_time_pairs,
    make_schedule,
    predict_noise_from_start,
    q_sample,
)
from ..geometry.procrustes import soft_procrustes
from ..nn.fusion import CrossModalFusionModule
from ..nn.image_backbone import ImageBackbone
from ..nn.matching import Matching, MatchingConfig
from ..nn.point_backbone import PointBackbone, PointBackboneConfig
from ..ops.partition import batch_mutual_topk_select, point_to_node_partition
from ..ops.select import mutual_topk_mask
from ..ops.vision import create_meshgrid


class Batch2D3D(NamedTuple):
    """One batch of image<->cloud pairs, padded/static."""

    image: jnp.ndarray           # [B, H, W, 1] grayscale
    img_points: jnp.ndarray      # [B, H*W, 3] back-projected real depth (cam frame)
    img_valid: jnp.ndarray       # [B, H*W] bool (depth valid)
    # point-cloud pyramid (3 levels for the 2d3d point backbone)
    points: Tuple[jnp.ndarray, ...]
    masks: Tuple[jnp.ndarray, ...]
    neighbors: Tuple[jnp.ndarray, ...]
    pools: Tuple[jnp.ndarray, ...]
    upsamples: Tuple[jnp.ndarray, ...]
    pcd_feats: jnp.ndarray       # [B, N0, 1]
    # nodes = coarse level points
    transform: jnp.ndarray       # [B, 4, 4] cam-from-cloud GT
    intrinsics: jnp.ndarray      # [B, 3, 3]
    # optional tower outputs
    dino_feats: Optional[jnp.ndarray] = None    # [B, h14, w14, C] final patch tokens
    mono_depth: Optional[jnp.ndarray] = None    # [B, H, W] raw DepthAnything output;
    # the pipeline lifts it with its LEARNABLE affine (model.py:273-275, 349)
    gt_src: Optional[jnp.ndarray] = None  # [B, G] coarse GT (node idx)
    gt_tgt: Optional[jnp.ndarray] = None  # [B, G] (patch idx)
    gt_valid: Optional[jnp.ndarray] = None
    gt_not_val: Optional[jnp.ndarray] = None  # [B] 1.0 when GT never validated
    # overlap-ratio GT pairs for the circle loss (utils.py:59-173)
    ov_src: Optional[jnp.ndarray] = None      # [B, Q] node idx
    ov_tgt: Optional[jnp.ndarray] = None      # [B, Q] patch idx
    ov_min: Optional[jnp.ndarray] = None      # [B, Q] min overlap ratio
    ov_max: Optional[jnp.ndarray] = None      # [B, Q] max overlap ratio
    ov_valid: Optional[jnp.ndarray] = None    # [B, Q]
    # fine GT pixel<->point pairs for the fine circle loss (loss.py:128-215)
    fine_pixels: Optional[jnp.ndarray] = None   # [B, M, 2] (v, u) int
    fine_pcd_idx: Optional[jnp.ndarray] = None  # [B, M]
    fine_valid: Optional[jnp.ndarray] = None    # [B, M]


@dataclasses.dataclass(frozen=True)
class Pipeline2D3DConfig:
    img_out_dim: int = 128
    img_base_dim: int = 128
    pcd_backbone: PointBackboneConfig = PointBackboneConfig(output_dim=128)
    hidden_dim: int = 256
    output_dim: int = 256
    num_heads: int = 4
    fusion_blocks: Tuple[str, ...] = ("self", "cross") * 3
    matching: MatchingConfig = MatchingConfig(feature_dim=256, confidence_threshold=0.2)
    coarse_stride: int = 8          # image patch grid = 1/8 resolution
    pcd_num_points_in_patch: int = 128   # reference config.py:84
    pcd_min_node_size: int = 5
    timesteps: int = 1000
    sample_steps: int = 10          # SAMPLE_STEP (=50 rgbdv2, =10 7scenes)
    ddim_eta: float = 1.0
    procrustes_sample_rate: float = 1.0
    # reference 2d3d config.py:129 (_C.procrustes.max_condition_num = 200)
    procrustes_max_condition: float = 200.0
    use_dino: bool = False
    use_mono_depth: bool = False
    dino_dim: int = 1024            # DINOv2 ViT-L patch-token width
    mono_depth_scale: float = 0.01  # reference feeds image_depth_any/100 (model.py:349)
    depth_limit: float = 6.0
    fine_topk: int = 2
    fine_threshold: float = 0.75


class DiffReg2D3D(nn.Module):
    cfg: Pipeline2D3DConfig

    def setup(self):
        cfg = self.cfg
        self.img_backbone = ImageBackbone(cfg.img_out_dim, cfg.img_base_dim)
        self.pcd_backbone = PointBackbone(cfg.pcd_backbone)
        self.fusion = CrossModalFusionModule(
            cfg.output_dim, cfg.hidden_dim, cfg.num_heads, cfg.fusion_blocks,
            use_dino=cfg.use_dino)
        self.denoising_fusion = CrossModalFusionModule(
            cfg.output_dim, cfg.hidden_dim, cfg.num_heads, cfg.fusion_blocks,
            use_dino=cfg.use_dino)
        self.coarse_matching = Matching(cfg.matching)
        self.denoising_matching = Matching(cfg.matching)
        self.schedule: DiffusionSchedule = make_schedule(cfg.timesteps)
        if cfg.use_dino:
            # dino_2_u (model.py:249): project DINO tokens before UNet injection
            self.dino_proj = nn.Dense(cfg.img_base_dim * 4, name="dino_proj")
        if cfg.use_mono_depth:
            # learnable monocular-depth affine z = depth*scale*a + b
            # (model.py:273-275; the reference creates these as raw
            # requires_grad tensors that never reach the optimizer — here
            # they are real params, trainable as intended)
            self.depth_coffa = self.param(
                "depth_coffa", lambda _: jnp.ones((1,), jnp.float32))
            self.depth_coffb = self.param(
                "depth_coffb", lambda _: jnp.zeros((1,), jnp.float32))

    # ------------------------------------------------------------------ #

    def _encode(self, batch: Batch2D3D):
        cfg = self.cfg
        b, h, w, _ = batch.image.shape
        hc, wc = h // cfg.coarse_stride, w // cfg.coarse_stride

        dino = batch.dino_feats if cfg.use_dino else None
        # UNet injection gets the PROJECTED tokens (dino_2_u, model.py:358);
        # the fusion module gets the raw 1024-d tokens (model.py:381)
        dino_ds = self.dino_proj(dino) if cfg.use_dino else None
        img_feats_list = self.img_backbone(batch.image, dino_ds)
        img_fine = img_feats_list[0]                      # [B, H, W, C]
        img_coarse_map = img_feats_list[-1]               # [B, H/8, W/8, 4C]

        # reference F.interpolate(..., align_corners=True) (model.py:375)
        from ..ops.vision import resize_align_corners

        img_feats_c = resize_align_corners(img_coarse_map, (hc, wc))
        img_feats_c = img_feats_c.reshape(b, hc * wc, -1)

        pix_norm = create_meshgrid(hc, wc, normalized=True, flatten=True)
        img_pixels_c = jnp.broadcast_to(pix_norm[None], (b, hc * wc, 2))

        pyr = {
            "points": batch.points, "masks": batch.masks,
            "neighbors": batch.neighbors, "pools": batch.pools,
            "upsamples": batch.upsamples, "features": batch.pcd_feats,
        }
        pcd_feats_list = self.pcd_backbone(pyr)
        pcd_feats_f, pcd_feats_c = pcd_feats_list[0], pcd_feats_list[-1]

        dino_tokens = None
        if cfg.use_dino:
            # identity when the coarse grid IS the DINO grid (stride 14)
            dino_tokens = resize_align_corners(
                dino, (hc, wc)).reshape(b, hc * wc, -1)

        return {
            "img_feats_f": img_fine,
            "img_feats_c": img_feats_c,
            "img_pixels_c": img_pixels_c,
            "dino_tokens": dino_tokens,
            "pcd_feats_f": pcd_feats_f,
            "pcd_feats_c": pcd_feats_c,
            "hc": hc, "wc": wc,
        }

    def _patch_centers(self, batch: Batch2D3D, hc, wc):
        """3D centers of each image patch: mean of valid (real or monocular)
        back-projected points in the patch (model.py patch center logic)."""
        cfg = self.cfg
        b, h, w, _ = batch.image.shape
        s = cfg.coarse_stride

        def centers_of(points_flat, valid_flat):
            # reference patchify subsamples each patch's pixel block with
            # stride 2 (model.py patchify(..., stride=2), utils.py:44-46)
            # BEFORE the masked mean — centers over the full block differ
            pts = points_flat.reshape(b, h // s, s, w // s, s, 3)
            pts = pts[:, :, ::2, :, ::2]
            # note: reshape trick needs H,W divisible by stride (enforced by
            # the data pipeline crop, like the reference's 476x630 crop)
            ss = pts.shape[2] * pts.shape[4]
            pts = pts.transpose(0, 1, 3, 2, 4, 5).reshape(b, hc * wc, ss, 3)
            val = valid_flat.reshape(b, h // s, s, w // s, s)
            val = val[:, :, ::2, :, ::2]
            val = val.transpose(0, 1, 3, 2, 4).reshape(b, hc * wc, ss)
            cnt = jnp.maximum(val.sum(-1, keepdims=True), 1)
            c = jnp.sum(pts * val[..., None], axis=2) / cnt
            return c, val.any(axis=-1)

        real_centers, real_valid = centers_of(batch.img_points, batch.img_valid)
        if cfg.use_mono_depth and batch.mono_depth is not None:
            da_points, da_mask = self._lift_mono_depth(batch)
            da_centers, da_valid = centers_of(da_points, da_mask)
        else:
            da_centers, da_valid = real_centers, real_valid
        return real_centers, real_valid, da_centers, da_valid

    def _lift_mono_depth(self, batch: Batch2D3D):
        """DepthAnything map -> pseudo-3D points with the learnable affine
        (back_project_depth, model.py:849-901): z = depth*scale*a + b,
        z > depth_limit zeroed, mask = z > 0."""
        cfg = self.cfg
        b, h, w, _ = batch.image.shape
        z = batch.mono_depth.reshape(b, h * w) * cfg.mono_depth_scale
        z = z * self.depth_coffa + self.depth_coffb
        z = jnp.where(z > cfg.depth_limit, 0.0, z)
        fx = batch.intrinsics[:, 0, 0][:, None]
        fy = batch.intrinsics[:, 1, 1][:, None]
        cx = batch.intrinsics[:, 0, 2][:, None]
        cy = batch.intrinsics[:, 1, 2][:, None]
        grid = create_meshgrid(h, w, flatten=True)       # [HW, 2] (v, u)
        u = grid[None, :, 1]
        v = grid[None, :, 0]
        x = (u - cx) * z / fx
        y = (v - cy) * z / fy
        return jnp.stack([x, y, z], axis=-1), z > 0.0

    def _warp_nodes(self, x, nodes, centers_da, node_masks, center_masks,
                    node_pad=None):
        """Sinkhorn-project noisy matrix, 3D-3D Procrustes pcd-nodes ->
        DA patch centers, warp nodes (get_warped_from_noising_matching3D3D,
        model.py:830-846). ``node_pad``: static-padding mask of the node axis
        (node_masks is a semantic validity mask — see ops.sinkhorn)."""
        conf = self.denoising_matching.sinkhorn(
            x, node_masks, center_masks, src_pad=node_pad,
            tgt_pad=jnp.ones_like(center_masks))
        res = soft_procrustes(
            conf, nodes, centers_da, node_masks, center_masks,
            sample_rate=self.cfg.procrustes_sample_rate,
            max_condition_num=self.cfg.procrustes_max_condition,
            # the 2d3d SoftProcrustesLayer budgets the top-k by MASK sums
            # (procrustes.py:61-62), not padded sizes as in 3dmatch
            use_masked_lengths=True,
        )
        warped = nodes @ jnp.swapaxes(res.rotation_fwd, 1, 2) \
            + jnp.swapaxes(res.translation_fwd, 1, 2)
        return warped

    def _denoise(self, enc, batch, nodes_warped, node_masks, img_valid_c):
        # fusion attention semantics mirror the reference: NO image-token
        # masking (the reference passes no masks, model.py:612-618 — every
        # grid patch is a real token) and only shape-padding masked on the
        # pcd side; the gated node_masks apply at the MATCHER
        img_t, pcd_t = self.denoising_fusion(
            enc["img_feats_c"], enc["img_pixels_c"],
            enc["pcd_feats_c"], nodes_warped,
            img_feats_dino=enc["dino_tokens"],
            img_valid=None, pcd_valid=batch.masks[-1])
        conf, _ = self.denoising_matching(
            pcd_t, img_t, None, None, node_masks, img_valid_c, pe_type="sinusoidal",
            src_pad=batch.masks[-1], tgt_pad=jnp.ones_like(img_valid_c))
        return conf

    # ------------------------------------------------------------------ #

    def __call__(self, batch: Batch2D3D, rng, mode: str = "ddim",
                 x_init: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        enc = self._encode(batch)
        hc, wc = enc["hc"], enc["wc"]
        b = batch.image.shape[0]

        nodes = batch.points[-1]            # [B, Nc, 3] coarse pcd nodes
        node_masks_lvl = batch.masks[-1]

        # 3D patches: only nodes with enough members count (model.py:403-416)
        def part_one(pts_f, nodes_i, pv, nv):
            return point_to_node_partition(pts_f, nodes_i, pv, nv,
                                           cfg.pcd_num_points_in_patch)

        part = jax.vmap(part_one)(batch.points[0], nodes, batch.masks[0], node_masks_lvl)
        node_masks = part.node_masks & (part.node_sizes > cfg.pcd_min_node_size)

        real_centers, center_valid, da_centers, da_valid = self._patch_centers(
            batch, hc, wc)
        img_valid_c = center_valid

        # fused features + coarse matcher (single-pass / "backbone" result);
        # see _denoise for the fusion mask semantics
        img_t, pcd_t = self.fusion(
            enc["img_feats_c"], enc["img_pixels_c"], enc["pcd_feats_c"], nodes,
            img_feats_dino=enc["dino_tokens"],
            img_valid=None, pcd_valid=batch.masks[-1])
        conf_pred, _ = self.coarse_matching(
            pcd_t, img_t, None, None, node_masks, img_valid_c, pe_type="sinusoidal",
            src_pad=node_masks_lvl, tgt_pad=jnp.ones_like(img_valid_c))

        out = {
            "conf_matrix_pred": conf_pred,
            "node_masks": node_masks,
            "img_valid_c": img_valid_c,
            "nodes": nodes,
            "patch_centers": real_centers,
            "patch_centers_da": da_centers,
            "pcd_feats_c": pcd_t,
            "img_feats_c": img_t,
            "partition": part,
            "img_feats_f": enc["img_feats_f"],
            "pcd_feats_f": enc["pcd_feats_f"],
        }

        if mode == "train":
            matrix_gt = _matrix_from_indices(
                batch.gt_src, batch.gt_tgt, batch.gt_valid,
                node_masks.shape[1], img_valid_c.shape[1])
            rng_t, rng_n = jax.random.split(rng)
            ts = jax.random.randint(rng_t, (b,), 0, cfg.timesteps)
            noise = jax.random.normal(rng_n, matrix_gt.shape)
            disturbed = q_sample(self.schedule, matrix_gt, ts, noise)
            nodes_warped = self._warp_nodes(disturbed, nodes, da_centers,
                                            node_masks, da_valid,
                                            node_pad=node_masks_lvl)
            conf_gt_hat = self._denoise(enc, batch, nodes_warped, node_masks, img_valid_c)
            out.update({"conf_matrix_gt_hat": conf_gt_hat, "matrix_gt": matrix_gt,
                        "timesteps": ts})
            return out

        if mode == "backbone":
            corr = batch_mutual_topk_select(conf_pred, 1, node_masks, img_valid_c,
                                            mutual=False)
            out["corr_mask"] = corr
            return out

        # DDIM sampling (model.py:637-694) — deterministic, no min-shift
        steps = cfg.sample_steps
        pairs = jnp.asarray(ddim_time_pairs(cfg.timesteps, steps))
        x0 = jax.random.normal(rng, (b, node_masks.shape[1], img_valid_c.shape[1])) \
            if x_init is None else x_init

        def body(mdl, x, scan_in):
            time, time_next = scan_in
            nodes_warped = mdl._warp_nodes(x, nodes, da_centers, node_masks, da_valid,
                                           node_pad=node_masks_lvl)
            x_start = mdl._denoise(enc, batch, nodes_warped, node_masks, img_valid_c)
            tvec = jnp.full((b,), time, jnp.int32)
            eps = predict_noise_from_start(mdl.schedule, x, tvec, x_start)
            alpha = mdl.schedule.alphas_cumprod[time]
            alpha_next = mdl.schedule.alphas_cumprod[time_next]
            sigma = cfg.ddim_eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
            return x_start * jnp.sqrt(alpha_next) + c * eps, None

        scan = nn.scan(body, variable_broadcast=["params", "buffers"],
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        x, _ = scan(self, x0, (pairs[:, 0], pairs[:, 1]))

        conf = self.denoising_matching.sinkhorn(
            x, node_masks, img_valid_c, src_pad=node_masks_lvl,
            tgt_pad=jnp.ones_like(img_valid_c))
        corr = jax.vmap(lambda m: mutual_topk_mask(m, 1, mutual=False))(conf)
        # documented divergence: the reference's mutual_topk_select runs
        # unmasked (model.py:694), so every invalid all-zero conf row/column
        # contributes a junk (i, 0) / (0, j) pair; masking them here only
        # removes zero-score correspondences
        corr = corr & node_masks[:, :, None] & img_valid_c[:, None, :]
        out["conf_matrix_pred"] = conf
        out["corr_mask"] = corr
        return out


def fine_matching(
    img_feats_f,       # [H, W, C] fine image features (one pair)
    img_points_f,      # [H*W, 3] back-projected image points
    img_pixels_f,      # [H*W, 2] pixel coords (v, u)
    pcd_feats_f,       # [N0, C] fine point features
    pcd_points_f,      # [N0, 3]
    corr_src,          # [C] coarse corr: pcd node indices
    corr_tgt,          # [C] coarse corr: img patch indices
    corr_valid,        # [C]
    node_knn_indices,  # [M, Kc] fine-point indices per node (sentinel N0)
    node_knn_masks,    # [M, Kc]
    patch_pixel_indices,  # [P, Kp] flat pixel indices per patch (stride-2 subset)
    max_fine_corr: int,
    topk: int = 2,
    threshold: float = 0.75,
):
    """Patch-level fine matching (model.py:707-780), static shapes.

    For every coarse correspondence, cosine-match the patch's fine pixels
    against the node's fine points with mutual top-k + threshold; emit a
    fixed-size deduplicated correspondence buffer.
    """
    h, w, c = img_feats_f.shape
    n0 = pcd_feats_f.shape[0]
    img_flat = img_feats_f.reshape(-1, c)

    # gather per-correspondence candidate sets
    img_idx = patch_pixel_indices[corr_tgt]                 # [C, Kp]
    img_f = img_flat[img_idx]                               # [C, Kp, C]
    pcd_idx = node_knn_indices[corr_src]                    # [C, Kc]
    pcd_m = node_knn_masks[corr_src] & corr_valid[:, None]
    pcd_pad = jnp.concatenate([pcd_feats_f, jnp.zeros((1, c))], axis=0)
    pcd_f = pcd_pad[pcd_idx]                                # [C, Kc, C]

    def norm(x):
        return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8, None)

    sim = jnp.einsum("cpk,cqk->cpq", norm(img_f), norm(pcd_f),
                     precision=jax.lax.Precision.HIGHEST)   # [C, Kp, Kc]

    corr = batch_mutual_topk_select(
        sim, topk,
        valid_row=corr_valid[:, None] & jnp.ones(img_idx.shape, bool),
        valid_col=pcd_m, threshold=threshold, largest=True, mutual=True)

    # flatten to fixed-size buffer, highest scores first
    from ..ops.masked import NEG_INF

    flat_scores = jnp.where(corr, sim, NEG_INF).reshape(-1)
    scores, order = jax.lax.top_k(flat_scores, max_fine_corr)
    valid = scores > NEG_INF / 2
    kp, kc = img_idx.shape[1], pcd_idx.shape[1]
    ci = order // (kp * kc)
    pi = (order // kc) % kp
    qi = order % kc
    img_sel = img_idx[ci, pi]
    pcd_sel = jnp.minimum(pcd_idx[ci, qi], n0 - 1)

    # dedup (model.py:757-762) without int64 (x64 stays off on TPU):
    # lexsort on (img, pcd) and keep first occurrences
    big = jnp.int32(2**30)
    img_m = jnp.where(valid, img_sel, big)
    pcd_m = jnp.where(valid, pcd_sel, big)
    order2 = jnp.lexsort((pcd_m, img_m))
    img_s, pcd_s, val_s = img_m[order2], pcd_m[order2], valid[order2]
    first = (img_s != jnp.roll(img_s, 1)) | (pcd_s != jnp.roll(pcd_s, 1))
    first = first.at[0].set(True)
    uvalid = val_s & first
    img_u = jnp.where(uvalid, img_s, 0)
    pcd_u = jnp.where(uvalid, pcd_s, 0)

    out_scores = jnp.sum(norm(img_flat[img_u]) * norm(pcd_feats_f[pcd_u]), axis=-1)
    return {
        "img_corr_pixels": img_pixels_f[img_u],
        "img_corr_points": img_points_f[img_u],
        "pcd_corr_points": pcd_points_f[pcd_u],
        "pcd_corr_indices": pcd_u,
        "img_corr_indices": img_u,
        "corr_scores": jnp.where(uvalid, out_scores, 0.0),
        "corr_valid": uvalid,
    }


def patch_pixel_table(height, width, stride, subsample=2):
    """Flat pixel indices per patch with a stride-``subsample`` subset
    (reference patchify, experiments utils.py:28-55)."""
    import numpy as np

    hp, wp = height // stride, width // stride
    out = np.zeros((hp * wp, (stride // subsample) ** 2), np.int32)
    for i in range(hp):
        for j in range(wp):
            vs = np.arange(i * stride, (i + 1) * stride, subsample)
            us = np.arange(j * stride, (j + 1) * stride, subsample)
            grid = (vs[:, None] * width + us[None, :]).reshape(-1)
            out[i * wp + j] = grid
    return out


def _matrix_from_indices(gt_src, gt_tgt, gt_valid, n, m):
    def one(src, tgt, valid):
        mat = jnp.zeros((n, m), jnp.float32)
        return mat.at[jnp.where(valid, src, n), jnp.where(valid, tgt, m)].set(
            1.0, mode="drop")

    return jax.vmap(one)(gt_src, gt_tgt, gt_valid)
