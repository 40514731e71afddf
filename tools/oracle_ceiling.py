"""Oracle (perfect-matcher) ceilings for the synthetic training stories.

A training story is only evidence if its eval protocol is ATTAINABLE on its
scenes: the round-4 4D run "plateaued" at NFMR 0.10 because the absolute
4DMatch thresholds (IR/recall 0.04 m — lib/tester.py:241; anchor blend
radius 0.1 m — lib/tester.py:127) were applied to scenes whose coarse
spacing was 6x the reference's (first_subsampling_dl 0.01,
configs/test/4dmatch.yaml:9 -> coarse voxel 0.04 = one threshold). This
tool computes the metric values a PERFECT matcher (the GT correspondences
themselves) would score, which upper-bounds any trained model:

    python tools/oracle_ceiling.py          # both stories, committed scales

Round-5 measurements (CPU, 32 pairs each):
  4D  story scale (1/6, flow 0.1 post-scale): IR@0.04=1.00  NFMR=0.86
  4D  legacy scale (1.0, flow 0.05):          IR@0.04=0.21  NFMR=0.15  <- ceiling-bound
  2D-3D story (112x154, 1024 pts):            IR@0.05=1.00  RR=1.00
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIFFREG_FORCE_CPU") or __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def oracle_4d(scale, flow_amp, seeds=(0, 1), batch=8, n_points=512):
    """(mean IR@0.04, mean NFMR) for the GT coarse matches at this scene
    scale — the 4DMatch tester protocol with a perfect matcher."""
    from diffreg_tpu.data import batch_from_samples, make_pair
    from diffreg_tpu.data.pyramid import PyramidConfig, build_pair_pyramid
    from diffreg_tpu.data.synthetic import tiny_spec
    from diffreg_tpu.eval.metrics import inlier_ratio, nfmr

    cfg = PyramidConfig(first_subsampling_dl=0.06 * scale,
                        coarse_match_radius=0.15 * scale)
    spec = tiny_spec(n_points)
    coarse_lvl = 2          # level -2 of 4 (4dmatch.yaml:27)
    m_metric = n_points
    irs, nfs = [], []
    for seed in seeds:
        rng = np.random.RandomState(seed)
        samples, mps, mfs, mvs = [], [], [], []
        for _ in range(batch):
            src, tgt, rot, trn, flow = make_pair(
                rng, n_points, deformable=True, flow_amp=flow_amp, scale=scale)
            samples.append(build_pair_pyramid(src, tgt, rot, trn, cfg, spec,
                                              scene_flow=flow))
            pcd = np.zeros((m_metric, 3), np.float32)
            fl = np.zeros((m_metric, 3), np.float32)
            va = np.zeros(m_metric, bool)
            n = min(len(src), m_metric)
            pcd[:n], fl[:n], va[:n] = src[:n], flow[:n], True
            mps.append(pcd), mfs.append(fl), mvs.append(va)
        b = batch_from_samples(samples, as_jnp=True)
        coarse = np.asarray(b.points[coarse_lvl])
        for i in range(batch):
            sidx = np.clip(np.asarray(b.src_idx_coarse[i]), 0,
                           coarse.shape[1] - 1)
            tidx = np.clip(np.asarray(b.tgt_idx_coarse[i]), 0,
                           coarse.shape[1] - 1)
            s_pcd, t_pcd = coarse[i][sidx], coarse[i][tidx]
            gs = np.clip(np.asarray(b.gt_src[i]), 0, len(sidx) - 1)
            gt_ = np.clip(np.asarray(b.gt_tgt[i]), 0, len(tidx) - 1)
            gv = np.asarray(b.gt_valid[i])
            src_c, tgt_c = s_pcd[gs], t_pcd[gt_]
            flow_c = np.asarray(b.coarse_flow[i])[gs]
            ir = inlier_ratio(jnp.asarray(src_c), jnp.asarray(tgt_c),
                              jnp.asarray(gv), b.rot_gt[i],
                              b.trn_gt[i][:, 0], inlier_thr=0.04,
                              coarse_flow_corr=jnp.asarray(flow_c))
            v = nfmr(jnp.asarray(mps[i]), jnp.asarray(mfs[i]), b.rot_gt[i],
                     b.trn_gt[i][:, 0], jnp.asarray(src_c),
                     jnp.asarray(tgt_c), jnp.asarray(gv),
                     jnp.asarray(mvs[i]), recall_thr=0.04)
            irs.append(float(ir)), nfs.append(float(v))
    return float(np.mean(irs)), float(np.mean(nfs))


def oracle_2d3d(seeds=(0, 1), batch=4, img_hw=(112, 154), n_points=1024):
    """(mean IR@0.05, mean RR) for the GT fine pixel<->point pairs through
    the real PnP-RANSAC + camera-RMSE math (eval.py:29-339 protocol)."""
    from diffreg_tpu.data.synthetic2d3d import synthetic_2d3d_batch
    from diffreg_tpu.engine.tester2d3d import (correspondence_inlier_ratio,
                                               registration_rmse)
    from diffreg_tpu.eval.pnp import pnp_ransac

    h, w = img_hw
    irs, rrs = [], []
    for seed in seeds:
        b = synthetic_2d3d_batch(batch_size=batch, img_hw=img_hw,
                                 n_points=n_points, seed=seed,
                                 coarse_stride=14, with_full_gt=True,
                                 n_overlap=256, n_fine_gt=128)
        for i in range(batch):
            pix = np.asarray(b.fine_pixels[i])            # (v, u)
            pidx = np.asarray(b.fine_pcd_idx[i])
            val = np.asarray(b.fine_valid[i])
            pcd_pts = np.asarray(b.points[0][i])[pidx]    # world frame
            img_pts = np.asarray(b.img_points[i])[pix[:, 0] * w + pix[:, 1]]
            pixels_uv = pix[:, ::-1].astype(np.float32)
            ir, _ = correspondence_inlier_ratio(
                jnp.asarray(pcd_pts), jnp.asarray(img_pts),
                jnp.asarray(val), b.transform[i], 0.05)
            res = pnp_ransac(jax.random.PRNGKey(seed * 10 + i),
                             jnp.asarray(pcd_pts), jnp.asarray(pixels_uv),
                             jnp.asarray(val), b.intrinsics[i],
                             distance_tolerance=8.0, num_hypotheses=4096)
            rmse = registration_rmse(b.points[0][i], b.masks[0][i],
                                     res.rotation, res.translation,
                                     b.transform[i])
            irs.append(float(ir)), rrs.append(float(rmse) < 0.1)
    return float(np.mean(irs)), float(np.mean(rrs))


if __name__ == "__main__":
    from tools.train_synthetic_4d import FLOW_AMP, SCENE_SCALE

    ir, nf = oracle_4d(SCENE_SCALE, FLOW_AMP, seeds=range(4))
    print(f"4D story scale ({SCENE_SCALE:.3f}): oracle IR@0.04={ir:.3f} "
          f"NFMR={nf:.3f}")
    ir0, nf0 = oracle_4d(1.0, 0.05, seeds=range(4))
    print(f"4D legacy scale (1.0): oracle IR@0.04={ir0:.3f} NFMR={nf0:.3f}")
    ir2, rr2 = oracle_2d3d(seeds=range(4))
    print(f"2D-3D story: oracle IR@0.05={ir2:.3f} RR={rr2:.3f}")
