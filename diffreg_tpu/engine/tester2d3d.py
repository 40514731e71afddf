"""2D-3D benchmark tester: PIR / PMR / IR / OR / FMR / RR(RMSE) / RRE / RTE.

Re-implements the reference eval protocol (Diff-Reg-2d3d/experiments/.../
test.py:57-91 + eval.py:29-339) in two stages, like the reference:

  * ``TwoDThreeDTester.test``: inference + fine matching + device PnP; when
    ``cache_dir`` is given every pair's predictions are written to
    ``cache_dir/<scene>/<idx>.npz`` (the reference's npz prediction cache);
  * ``eval_from_cache``: reads the cache and computes the full reference
    metric table — PIR, PMR>0/>=0.1/>=0.3/>=0.5, IR, OR, FMR, RR (RMSE <
    0.1 m via PnP-RANSAC at 8 px), mean/median RRE/RTE over successful
    registrations — with per-scene SummaryBoards and overall means of the
    scene means (eval.py:230-339).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.pnp import pnp_ransac
from ..geometry.se3 import rotation_error_deg, translation_error
from ..utils.logging import Logger, SummaryBoard


@dataclasses.dataclass
class Test2D3DConfig:
    acceptance_radius: float = 0.05
    ir_threshold: float = 0.1       # FMR threshold on IR
    rmse_threshold: float = 0.1     # RR threshold
    pnp_tolerance_px: float = 8.0
    pnp_hypotheses: int = 8192
    max_fine_corr: int = 2048
    # PIR GT = overlap-based node correspondences with min overlap above
    # this (reference EvalFunction, loss.py:258-261; config.py:53)
    acceptance_overlap: float = 0.3
    # "device" = on-device parallel PnP-RANSAC (the pairs/sec path);
    # "opencv" = cv2.solvePnPRansac, the reference's protocol-exact
    # estimator (vision3d/utils/opencv.py:10-60) for metric-audit runs
    pnp_backend: str = "device"


PMR_TIERS = (0.0, 0.1, 0.3, 0.5)    # eval.py:34-37


def patch_inlier_ratio(corr_mask, gt_src, gt_tgt, gt_valid):
    """PIR: fraction of predicted coarse node<->patch correspondences that
    are in the GT set (eval.py evaluate_sparse_correspondences semantics).

    corr_mask [N, M] bool; gt_* padded index lists.
    """
    n, m = corr_mask.shape
    gt_mat = jnp.zeros((n, m), bool).at[
        jnp.where(gt_valid, gt_src, n), jnp.where(gt_valid, gt_tgt, m)
    ].set(True, mode="drop")
    hits = (corr_mask & gt_mat).sum()
    total = jnp.maximum(corr_mask.sum(), 1)
    return hits / total


def correspondence_inlier_ratio(pcd_corr_points, img_corr_points, corr_valid,
                                transform, radius):
    """IR: fraction of fine correspondences whose cloud point, mapped by the
    GT cam-from-cloud transform, lands within ``radius`` of the image point
    (array_ops/registration_utils.py evaluate_correspondences)."""
    cam = pcd_corr_points @ transform[:3, :3].T + transform[:3, 3]
    d = jnp.linalg.norm(cam - img_corr_points, axis=-1)
    inl = (d < radius) & corr_valid
    n = jnp.maximum(corr_valid.sum(), 1)
    return inl.sum() / n, corr_valid.sum()


def correspondence_overlap_np(pcd_corr_points, img_corr_points, transform, radius):
    """OR: fraction of transformed cloud corr points with ANY image corr
    point within ``radius`` (vision3d point_cloud_overlap, metrics.py:160)."""
    if len(pcd_corr_points) == 0:
        return 0.0
    from scipy.spatial import cKDTree

    cam = pcd_corr_points @ transform[:3, :3].T + transform[:3, 3]
    d, _ = cKDTree(img_corr_points).query(cam, k=1)
    return float((d < radius).mean())


def registration_rmse(pcd_points, valid, est_rot, est_trn, transform):
    """RMSE between estimated and GT camera-space positions of cloud points."""
    est = pcd_points @ est_rot.T + est_trn.reshape(1, 3)
    gt = pcd_points @ transform[:3, :3].T + transform[:3, 3]
    d2 = jnp.sum((est - gt) ** 2, axis=-1)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.sqrt(jnp.sum(jnp.where(valid, d2, 0.0)) / n)


def _host_pnp_batch(fm, batch, cfg: Test2D3DConfig):
    """cv2.solvePnPRansac per pair on the fine correspondences — the
    reference estimator (vision3d/utils/opencv.py:10-60). Our pixel buffers
    are already (u, v) ordered, so ``transposed=False``. Falls back to
    identity when cv2 fails or <4 correspondences (reference returns None
    and the pair scores RR=0)."""
    from ..eval.host_estimators import pnp_pose_opencv

    val = np.asarray(fm["corr_valid"])
    pts = np.asarray(fm["pcd_corr_points"])
    pix = np.asarray(fm["img_corr_pixels"])
    intr = np.asarray(batch.intrinsics)
    b = val.shape[0]
    rot = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    trn = np.zeros((b, 3, 1), np.float32)
    for i in range(b):
        v = val[i]
        tfm = pnp_pose_opencv(pts[i][v], pix[i][v], intr[i],
                              distance_tolerance=cfg.pnp_tolerance_px,
                              transposed=False)
        if tfm is not None:
            rot[i] = tfm[:3, :3]
            trn[i] = tfm[:3, 3:4]
    return jnp.asarray(rot), jnp.asarray(trn)


def _scene_of(meta_entry) -> str:
    if isinstance(meta_entry, str):
        return meta_entry
    if isinstance(meta_entry, dict):
        return str(meta_entry.get("scene_name", "scene"))
    return "scene"


class TwoDThreeDTester:
    """Runs DiffReg2D3D end-to-end with fine matching + PnP and accumulates
    the reference metric set; optionally writes the npz prediction cache."""

    def __init__(self, model, variables, cfg: Test2D3DConfig = Test2D3DConfig(),
                 logger: Optional[Logger] = None, mode: str = "ddim"):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.logger = logger or Logger(None)
        self.mode = mode
        self._forward = jax.jit(lambda v, b, r: model.apply(v, b, r, mode=mode))
        # fine-matching closures are shape-specialized: key on (h, w, stride)
        # so a loader that yields several image-size buckets never reuses a
        # stale pixel table
        self._fine_fns = {}

    def _fine_fn(self, h: int, w: int, stride: int):
        key = (h, w, stride)
        if key in self._fine_fns:
            return self._fine_fns[key]

        from ..models.pipeline_2d3d import fine_matching, patch_pixel_table
        from ..ops.vision import create_meshgrid

        cfg = self.cfg
        table = jnp.asarray(patch_pixel_table(h, w, stride))
        pix_f = jnp.asarray(
            np.asarray(create_meshgrid(h, w, flatten=True))[:, ::-1].copy())
        # (u, v) ordering for PnP

        def _one(img_ff, img_pts, pcd_ff, pcd_pts, c_src, c_tgt, c_val,
                 knn_idx, knn_msk, transform, intrinsics, key):
            fm = fine_matching(
                img_ff, img_pts, pix_f, pcd_ff, pcd_pts,
                c_src, c_tgt, c_val, knn_idx, knn_msk, table,
                cfg.max_fine_corr)
            ir, n_corr = correspondence_inlier_ratio(
                fm["pcd_corr_points"], fm["img_corr_points"],
                fm["corr_valid"], transform, cfg.acceptance_radius)
            res = pnp_ransac(key, fm["pcd_corr_points"],
                             fm["img_corr_pixels"], fm["corr_valid"],
                             intrinsics,
                             distance_tolerance=cfg.pnp_tolerance_px,
                             num_hypotheses=cfg.pnp_hypotheses)
            return fm, ir, n_corr, res.rotation, res.translation, res.success

        fn = jax.jit(jax.vmap(_one, in_axes=(0,) * 12))
        self._fine_fns[key] = fn
        return fn

    def test(self, make_iter: Callable[[], Iterable], rng=None,
             cache_dir: Optional[str] = None):
        from ..ops.select import extract_correspondences

        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        board = SummaryBoard()
        irs, pirs = [], []
        pair_idx = 0

        for batch, meta in make_iter():
            rng, r1, r2 = jax.random.split(rng, 3)
            out = self._forward(self.variables, batch, r1)
            b, h, w, _ = batch.image.shape
            stride = self.model.cfg.coarse_stride
            fine_fn = self._fine_fn(h, w, stride)

            # coarse corr buffers from the corr mask
            c = cfg.max_fine_corr // 4
            corrs = jax.vmap(lambda m, s: extract_correspondences(m, s, c))(
                out["corr_mask"], out["conf_matrix_pred"])

            img_ff = out.get("img_feats_f")
            pcd_ff = out.get("pcd_feats_f")
            if img_ff is None:
                raise RuntimeError("pipeline must return fine features")

            keys = jax.random.split(r2, b)
            part = out["partition"]
            fm, ir, n_corr, rot, trn, ok = fine_fn(
                img_ff, batch.img_points, pcd_ff, batch.points[0],
                corrs.src_idx, corrs.tgt_idx, corrs.valid,
                part.node_knn_indices, part.node_knn_masks,
                batch.transform, batch.intrinsics, keys)
            if cfg.pnp_backend == "opencv":
                rot, trn = _host_pnp_batch(fm, batch, cfg)

            for i in range(b):
                rmse = registration_rmse(batch.points[0][i], batch.masks[0][i],
                                         rot[i], trn[i], batch.transform[i])
                rre = rotation_error_deg(rot[i][None],
                                         batch.transform[i][None, :3, :3])[0]
                rte = translation_error(trn[i][None, :, 0],
                                        batch.transform[i][None, :3, 3])[0]
                # PIR against the OVERLAP-based GT set filtered by
                # acceptance_overlap (reference EvalFunction loss.py:258-261);
                # the escalated binary GT is a train-time device, not the
                # eval protocol — fall back to it only when overlaps are
                # absent (synthetic demo batches)
                if getattr(batch, "ov_valid", None) is not None:
                    ov_ok = batch.ov_valid[i] & \
                        (batch.ov_min[i] > cfg.acceptance_overlap)
                    pir = float(patch_inlier_ratio(
                        out["corr_mask"][i], batch.ov_src[i],
                        batch.ov_tgt[i], ov_ok))
                else:
                    pir = float(patch_inlier_ratio(
                        out["corr_mask"][i], batch.gt_src[i],
                        batch.gt_tgt[i], batch.gt_valid[i]))
                irs.append(float(ir[i]))
                pirs.append(pir)
                board.update({
                    "IR": float(ir[i]),
                    "PIR": pir,
                    "RMSE": float(rmse),
                    "RR": float(rmse < cfg.rmse_threshold),
                    "RRE": float(rre),
                    "RTE": float(rte),
                    "n_corr": float(n_corr[i]),
                })
                if cache_dir is not None:
                    self._write_cache(cache_dir, _scene_of(meta[i]), pair_idx,
                                      batch, out, fm, corrs, i)
                pair_idx += 1

        irs = np.asarray(irs)
        pirs = np.asarray(pirs)
        summary = board.summary()
        summary["FMR"] = float((irs > cfg.ir_threshold).mean()) if len(irs) else 0.0
        for tier in PMR_TIERS:
            key = "PMR>0" if tier == 0.0 else f"PMR>={tier}"
            summary[key] = float((pirs > tier).mean() if tier == 0.0
                                 else (pirs >= tier).mean()) if len(pirs) else 0.0
        summary["pairs"] = len(irs)
        self.logger.info(f"2D-3D test: {summary}")
        return summary

    def _write_cache(self, cache_dir, scene, pair_idx, batch, out, fm, corrs, i):
        """Per-pair npz prediction cache (reference test.py:57-91).

        GT node correspondences are the OVERLAP pairs with their min overlaps
        (reference caches gt_node_corr_min_overlaps, test.py:82-87) so
        eval_from_cache can apply acceptance_overlap like EvalFunction; the
        escalated binary GT is cached only as a fallback when overlaps are
        absent."""
        os.makedirs(os.path.join(cache_dir, scene), exist_ok=True)
        val = np.asarray(fm["corr_valid"][i])
        cmask = np.asarray(out["corr_mask"][i])
        pred_src, pred_tgt = np.nonzero(cmask)
        pcd_mask = np.asarray(batch.masks[0][i])
        if getattr(batch, "ov_valid", None) is not None:
            ov_val = np.asarray(batch.ov_valid[i])
            gt_src = np.asarray(batch.ov_src[i])[ov_val]
            gt_tgt = np.asarray(batch.ov_tgt[i])[ov_val]
            gt_min_ov = np.asarray(batch.ov_min[i])[ov_val]
        else:
            gt_val = np.asarray(batch.gt_valid[i])
            gt_src = np.asarray(batch.gt_src[i])[gt_val]
            gt_tgt = np.asarray(batch.gt_tgt[i])[gt_val]
            gt_min_ov = np.ones(len(gt_src), np.float32)
        np.savez_compressed(
            os.path.join(cache_dir, scene, f"{pair_idx:06d}.npz"),
            pcd_points=np.asarray(batch.points[0][i])[pcd_mask],
            img_corr_points=np.asarray(fm["img_corr_points"][i])[val],
            pcd_corr_points=np.asarray(fm["pcd_corr_points"][i])[val],
            img_corr_pixels=np.asarray(fm["img_corr_pixels"][i])[val],
            corr_scores=np.asarray(fm["corr_scores"][i])[val],
            pcd_num_nodes=cmask.shape[0],
            img_num_nodes=cmask.shape[1],
            pcd_node_corr_indices=pred_src,
            img_node_corr_indices=pred_tgt,
            gt_pcd_node_corr_indices=gt_src,
            gt_img_node_corr_indices=gt_tgt,
            gt_node_corr_min_overlaps=gt_min_ov,
            transform=np.asarray(batch.transform[i]),
            intrinsics=np.asarray(batch.intrinsics[i]),
        )


def eval_from_cache(cache_dir: str, cfg: Test2D3DConfig = Test2D3DConfig(),
                    logger: Optional[Logger] = None, num_corr: Optional[int] = None,
                    rng=None):
    """Second-stage evaluation from the npz prediction cache — the
    reference eval.py:29-339 equivalent: per-scene boards and overall
    means-of-scene-means for PIR/PMR tiers, IR/OR/FMR, RR/RRE/RTE."""
    import glob

    logger = logger or Logger(None)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    scene_rows = {}
    overall = SummaryBoard()

    scene_dirs = sorted(d for d in glob.glob(os.path.join(cache_dir, "*"))
                        if os.path.isdir(d))
    for scene_dir in scene_dirs:
        scene = os.path.basename(scene_dir)
        sb = SummaryBoard()
        rres, rtes = [], []
        for fname in sorted(glob.glob(os.path.join(scene_dir, "*.npz"))):
            d = np.load(fname)
            gt_src = d["gt_pcd_node_corr_indices"]
            gt_tgt = d["gt_img_node_corr_indices"]
            if "gt_node_corr_min_overlaps" in d:
                # EvalFunction protocol: GT = overlap pairs with
                # min overlap > acceptance_overlap (loss.py:258-261)
                keep = d["gt_node_corr_min_overlaps"] > cfg.acceptance_overlap
                gt_src, gt_tgt = gt_src[keep], gt_tgt[keep]
            pir = _sparse_precision(
                int(d["pcd_num_nodes"]), int(d["img_num_nodes"]),
                d["pcd_node_corr_indices"], d["img_node_corr_indices"],
                gt_src, gt_tgt)
            sb.update({"PIR": pir})
            for tier in PMR_TIERS:
                key = "PMR>0" if tier == 0.0 else f"PMR>={tier}"
                sb.update({key: float(pir > tier if tier == 0.0 else pir >= tier)})

            pcd_c = d["pcd_corr_points"]
            img_c = d["img_corr_points"]
            pix_c = d["img_corr_pixels"]
            scores = d["corr_scores"]
            if num_corr is not None and len(scores) > num_corr:
                sel = np.argsort(-scores)[:num_corr]
                pcd_c, img_c, pix_c, scores = pcd_c[sel], img_c[sel], pix_c[sel], scores[sel]

            tfm = d["transform"]
            if len(pcd_c) > 0:
                cam = pcd_c @ tfm[:3, :3].T + tfm[:3, 3]
                dist = np.linalg.norm(cam - img_c, axis=-1)
                ir = float((dist < cfg.acceptance_radius).mean())
                ov = correspondence_overlap_np(pcd_c, img_c, tfm, cfg.acceptance_radius)
            else:
                ir, ov = 0.0, 0.0
            sb.update({"IR": ir, "OR": ov,
                       "FMR": float(ir >= cfg.ir_threshold)})

            # registration via PnP re-run on the cached correspondences
            rr = 0.0
            if len(pcd_c) >= 4:
                if cfg.pnp_backend == "opencv":
                    from ..eval.host_estimators import pnp_pose_opencv

                    tfm_est = pnp_pose_opencv(
                        pcd_c, pix_c, d["intrinsics"],
                        distance_tolerance=cfg.pnp_tolerance_px,
                        transposed=False)
                    if tfm_est is None:
                        tfm_est = np.eye(4)
                    rot = tfm_est[:3, :3].astype(np.float32)
                    trn = tfm_est[:3, 3:4].astype(np.float32)
                else:
                    buf = cfg.max_fine_corr
                    p3 = np.zeros((buf, 3), np.float32)
                    px = np.zeros((buf, 2), np.float32)
                    vv = np.zeros(buf, bool)
                    n = min(len(pcd_c), buf)
                    order = np.argsort(-scores)[:n]
                    p3[:n], px[:n], vv[:n] = pcd_c[order], pix_c[order], True
                    rng, k = jax.random.split(rng)
                    res = pnp_ransac(k, jnp.asarray(p3), jnp.asarray(px),
                                     jnp.asarray(vv), jnp.asarray(d["intrinsics"]),
                                     distance_tolerance=cfg.pnp_tolerance_px,
                                     num_hypotheses=cfg.pnp_hypotheses)
                    rot, trn = np.asarray(res.rotation), np.asarray(res.translation)
                pts = d["pcd_points"]
                est = pts @ rot.T + trn.reshape(1, 3)
                gt = pts @ tfm[:3, :3].T + tfm[:3, 3]
                rmse = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, -1))))
                rr = float(rmse < cfg.rmse_threshold)
                if rr > 0:
                    rre = float(rotation_error_deg(rot[None], tfm[None, :3, :3])[0])
                    rte = float(translation_error(trn[None, :, 0], tfm[None, :3, 3])[0])
                    rres.append(rre)
                    rtes.append(rte)
            sb.update({"RR": rr})

        row = sb.summary()
        if rres:
            row["RRE"] = float(np.mean(rres))
            row["RTE"] = float(np.mean(rtes))
            row["median_RRE"] = float(np.median(rres))
            row["median_RTE"] = float(np.median(rtes))
        scene_rows[scene] = row
        overall.update({k: v for k, v in row.items() if np.ndim(v) == 0})
        logger.info(f"scene {scene}: " +
                    ", ".join(f"{k}={v:.4f}" for k, v in row.items()))

    summary = overall.summary()
    logger.info("2D-3D eval (means of scene means): " +
                ", ".join(f"{k}={v:.4f}" for k, v in summary.items()))
    summary["scenes"] = scene_rows
    return summary


def _sparse_precision(n, m, src, tgt, gt_src, gt_tgt):
    """evaluate_sparse_correspondences precision (registration_utils.py:202)."""
    gt = np.zeros((n, m), bool)
    gt[gt_src, gt_tgt] = True
    pred = np.zeros((n, m), bool)
    pred[src, tgt] = True
    denom = max(pred.sum(), 1)
    return float((gt & pred).sum() / denom)
