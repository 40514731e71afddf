"""Benchmark testers: 3DMatch (IR/FMR/RR) and 4DMatch (IR/NFMR).

Re-implements the reference testers (Diff-Reg-3dmatch/lib/tester.py:9-124,
Diff-Reg-4dmatch/lib/tester.py:212-285) with the whole per-pair metric path
on device:

  * forward = DDIM sampling (jitted once per bucket);
  * pose = on-device parallel RANSAC (replaces per-pair host Open3D, 50k
    sequential iters);
  * IR / FMR / RR (covariance criterion) / NFMR computed from fixed-size
    correspondence buffers;
  * the 3-repeat averaging the reference uses to tame RANSAC variance
    (lib/tester.py:19-34) is a flag (our RANSAC is seeded and deterministic,
    so repeats measure sampling noise of the diffusion init instead).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import (inlier_ratio, masked_inlier_ratio, nfmr,
                            registration_recall_success)
from ..eval.ransac import ransac_pose
from ..ops.select import extract_correspondences, thresholded_mutual_argmax_mask
from ..utils.logging import Logger, SummaryBoard


@dataclasses.dataclass
class TestConfig:
    inlier_thr: float = 0.1          # 3DMatch (lib/tester.py:83); 4DMatch: 0.04
    fmr_thr: float = 0.05
    registration_thr: float = 0.2    # RR threshold (m)
    ransac_distance_thr: float = 0.05
    # 65536 matches the reference's 50k-iter o3d budget (models/loss.py:13-23)
    # at the hard-pair tail: the 2026-08-19 budget study (ROADMAP,
    # tools/ransac_budget_study.py) measured success@(5deg,0.1) on 5%-inlier
    # correspondence sets of 0.854 @16k / 0.979 @32k / 1.000 @65k (48 trials;
    # extra refine rounds don't move it). >=10% inlier pairs saturate by 8k,
    # so this only costs time on the metric-eval path, never the bench loop.
    # Memory is bounded regardless of the budget: ransac_pose scores
    # hypotheses in 16384-sized chunks, so the [H, C] distance matrix never
    # exceeds 16384 x max_corr f32 (64 MB/pair) on device.
    ransac_hypotheses: int = 65536
    # reference 3DMatch protocol averages 3 runs (lib/tester.py:19-34)
    num_repeats: int = 3
    match_thr: float = 0.55          # 4DMatch get_match threshold (README.md:25)
    max_corr: int = 1024
    nfmr_recall_thr: float = 0.04
    # "device" = on-device parallel RANSAC (the pairs/sec path);
    # "open3d" = the reference's host estimator (models/loss.py:13-24) for
    # protocol-exact metric-audit runs (requires open3d installed)
    pose_backend: str = "device"


def _pair_metrics_3dmatch(out, batch, cfg: TestConfig, rng):
    """Batched device metrics for the rigid benchmark."""
    b = batch.src_mask.shape[0]

    def one(conf, corr_mask, s_pcd, t_pcd, rot_gt, trn_gt, gt_cov, key):
        # IR over ALL matches, mask-based (reference loss.py:382-410);
        # the fixed-size buffer is only for the RANSAC hypothesis pool
        ir = masked_inlier_ratio(corr_mask, s_pcd, t_pcd, rot_gt, trn_gt[:, 0],
                                 inlier_thr=cfg.inlier_thr)
        corrs = extract_correspondences(corr_mask, conf, cfg.max_corr)
        src_c = s_pcd[corrs.src_idx]
        tgt_c = t_pcd[corrs.tgt_idx]
        res = ransac_pose(key, src_c, tgt_c, corrs.valid,
                          distance_threshold=cfg.ransac_distance_thr,
                          num_hypotheses=cfg.ransac_hypotheses)
        ok = registration_recall_success(
            res.rotation, res.translation, rot_gt, trn_gt, gt_cov,
            thr=cfg.registration_thr)
        n_corr = corrs.valid.sum()
        ok = jnp.where(n_corr >= 3, ok, False)
        return ir, ok.astype(jnp.float32), n_corr, res.rotation, res.translation

    keys = jax.random.split(rng, b)
    return jax.vmap(one)(out["conf_matrix_pred"], out["corr_mask"],
                         out["s_pcd"], out["t_pcd"],
                         batch.rot_gt, batch.trn_gt, batch.gt_cov, keys)


def _np_recall_success(rot, trn, rot_gt, trn_gt, cov, thr=0.2):
    """Host twin of registration_recall_success (loss.py:27-44): covariance
    transform error on the gt-relative pose, quaternion xyz + translation."""
    rel_r = rot_gt.T @ rot
    rel_t = rot_gt.T @ (trn - trn_gt)
    # scalar-first quaternion with non-negative scalar (nibabel mat2quat)
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(rel_r).as_quat()        # (x, y, z, w)
    xyz = q[:3] if q[3] >= 0 else -q[:3]
    er = np.concatenate([rel_t[:, 0], xyz])
    p = float(er @ cov @ er / cov[0, 0])
    return p <= thr**2


class _HostPoseMixin:
    """Host (Open3D) pose path shared by the testers — the reference's
    protocol-exact estimator for metric-audit runs (models/loss.py:13-24)."""

    def _host_pose_batch(self, out, batch):
        from ..eval.host_estimators import ransac_pose_open3d

        ir, src_c, tgt_c, valid = map(np.asarray,
                                      self._corrs(out, batch))
        rot_gt = np.asarray(batch.rot_gt)
        trn_gt = np.asarray(batch.trn_gt)
        gt_cov = np.asarray(batch.gt_cov)
        irs, rrs, ncs = [], [], []
        for i in range(len(ir)):
            v = valid[i]
            n = int(v.sum())
            ncs.append(n)
            irs.append(float(ir[i]))
            if n < 3:
                rrs.append(0.0)
                continue
            oks = []
            for _rep in range(self.cfg.num_repeats):
                pairs = np.stack([np.arange(n)] * 2, axis=1)
                tfm = ransac_pose_open3d(
                    src_c[i][v], tgt_c[i][v], pairs,
                    distance_threshold=self.cfg.ransac_distance_thr)
                oks.append(float(_np_recall_success(
                    tfm[:3, :3], tfm[:3, 3:4], rot_gt[i], trn_gt[i],
                    gt_cov[i], thr=self.cfg.registration_thr)))
            rrs.append(float(np.mean(oks)))
        return irs, rrs, ncs


class ThreeDMatchTester(_HostPoseMixin):
    """IR / FMR / RR over a test loader (lib/tester.py:37-124 equivalent)."""

    def __init__(self, model, variables, cfg: TestConfig = TestConfig(),
                 logger: Optional[Logger] = None, sample_steps: Optional[int] = None,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh — batches are sharded over
        its 'data' axis and the forward runs SPMD (the DDP-eval equivalent,
        reference main.py:125-129)."""
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.logger = logger or Logger(None)
        self.mesh = mesh
        fwd = lambda v, b, r: model.apply(v, b, r, mode="ddim")
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._forward = jax.jit(
                fwd, in_shardings=(replicated(mesh), batch_sharding(mesh),
                                   replicated(mesh)),
                out_shardings=batch_sharding(mesh))
        else:
            self._forward = jax.jit(fwd)
        self._metrics = jax.jit(
            lambda o, b, r: _pair_metrics_3dmatch(o, b, self.cfg, r))
        # host-backend path: device IR + corr buffers, pose on host
        cfg_ = self.cfg

        def corr_one(conf, corr_mask, s_pcd, t_pcd, rot_gt, trn_gt):
            ir = masked_inlier_ratio(corr_mask, s_pcd, t_pcd, rot_gt,
                                     trn_gt[:, 0], inlier_thr=cfg_.inlier_thr)
            corrs = extract_correspondences(corr_mask, conf, cfg_.max_corr)
            return ir, s_pcd[corrs.src_idx], t_pcd[corrs.tgt_idx], corrs.valid

        self._corrs = jax.jit(lambda o, b: jax.vmap(corr_one)(
            o["conf_matrix_pred"], o["corr_mask"], o["s_pcd"], o["t_pcd"],
            b.rot_gt, b.trn_gt))

    def test(self, make_iter: Callable[[], Iterable], rng=None):
        """One forward per pair; the ``num_repeats`` averaging re-runs ONLY
        the pose estimation, matching the reference protocol where the 3
        repeats exist to tame host-RANSAC nondeterminism (lib/tester.py:19-34)
        — NOT to resample the diffusion init."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        boards = SummaryBoard()
        results = {"ir": [], "rr": [], "n_corr": []}
        n_pairs = 0
        for batch, _meta in make_iter():
            rng, r1 = jax.random.split(rng)
            out = self._forward(self.variables, batch, r1)
            if self.cfg.pose_backend == "open3d":
                ir, rr, n_corr = self._host_pose_batch(out, batch)
                results["ir"].extend(ir)
                results["n_corr"].extend(n_corr)
                results["rr"].extend(rr)
                n_pairs += len(ir)
                continue
            rrs = []
            for rep in range(self.cfg.num_repeats):
                rng, r2 = jax.random.split(rng)
                ir, ok, n_corr, rot, trn = self._metrics(out, batch, r2)
                rrs.append(np.asarray(ok))
                if rep == 0:
                    results["ir"].extend(np.asarray(ir).tolist())
                    results["n_corr"].extend(np.asarray(n_corr).tolist())
                    n_pairs += len(np.asarray(ir))
            results["rr"].extend(np.mean(np.stack(rrs), axis=0).tolist())
        irs = np.asarray(results["ir"])
        summary = {
            "IR": float(irs.mean()) if n_pairs else 0.0,
            "FMR": float((irs > self.cfg.fmr_thr).mean()) if n_pairs else 0.0,
            "RR": float(np.mean(results["rr"])) if n_pairs else 0.0,
            "pairs": n_pairs,
        }
        self.logger.info(
            f"3DMatch test: RR={summary['RR']:.4f} IR={summary['IR']:.4f} "
            f"FMR={summary['FMR']:.4f} over {n_pairs} pairs")
        return summary


def make_metric_points_fn(max_points: int = 2048):
    """Build a metric_points_fn for FourDMatchTester from raw sample dicts.

    Uses the dataset's ``metric_index`` subset of the raw source cloud
    (4dmatch lib/tester.py:127-210); falls back to a uniform subset when the
    entry has none (e.g. synthetic demo pairs). Returns padded
    (metric_pcd [M,3], metric_flow [M,3], valid [M]).
    """
    import numpy as np

    def fn(meta: dict):
        src = meta.get("src_pcd")
        flow = meta.get("scene_flow")
        if src is None or flow is None:
            return None
        idx = meta.get("metric_index")
        if idx is None:
            idx = np.linspace(0, len(src) - 1, min(len(src), max_points)).astype(np.int64)
        idx = np.asarray(idx)[:max_points]
        m = max_points
        pcd = np.zeros((m, 3), np.float32)
        fl = np.zeros((m, 3), np.float32)
        valid = np.zeros(m, bool)
        n = len(idx)
        pcd[:n] = src[idx]
        fl[:n] = flow[idx]
        valid[:n] = True
        return pcd, fl, valid

    return fn


class FourDMatchTester:
    """IR / NFMR for deformable pairs (4dmatch lib/tester.py:212-285).

    Matches are extracted with get_match(thr, mutual=True) from the sigmoid
    prediction (4dmatch pipeline.py:192-194, tester.py:266).
    """

    def __init__(self, model, variables, cfg: TestConfig = TestConfig(inlier_thr=0.04),
                 logger: Optional[Logger] = None, mesh=None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.logger = logger or Logger(None)
        self.mesh = mesh
        fwd = lambda v, b, r: model.apply(v, b, r, mode="ddim")
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._forward = jax.jit(
                fwd, in_shardings=(replicated(mesh), batch_sharding(mesh),
                                   replicated(mesh)),
                out_shardings=batch_sharding(mesh))
        else:
            self._forward = jax.jit(fwd)

        def metrics(out, batch):
            conf = out["conf_matrix_pred"]
            mask = thresholded_mutual_argmax_mask(conf, self.cfg.match_thr, mutual=True)
            mask = mask & batch.src_mask[:, :, None] & batch.tgt_mask[:, None, :]

            def one(conf_i, mask_i, s_pcd, t_pcd, flow, rot_gt, trn_gt):
                corrs = extract_correspondences(mask_i, conf_i, self.cfg.max_corr)
                src_c = s_pcd[corrs.src_idx]
                tgt_c = t_pcd[corrs.tgt_idx]
                flow_c = flow[corrs.src_idx]
                ir = inlier_ratio(src_c, tgt_c, corrs.valid, rot_gt, trn_gt[:, 0],
                                  inlier_thr=self.cfg.inlier_thr,
                                  coarse_flow_corr=flow_c)
                return ir, corrs.valid.sum()

            return jax.vmap(one)(conf, mask, out["s_pcd"], out["t_pcd"],
                                 batch.coarse_flow, batch.rot_gt, batch.trn_gt)

        self._metrics = jax.jit(metrics)

    def test(self, make_iter: Callable[[], Iterable], rng=None,
             metric_points_fn=None):
        """metric_points_fn(meta) may return (metric_pcd, metric_flow,
        valid) arrays per pair to enable NFMR (needs raw clouds)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        irs, nfmrs = [], []
        for batch, meta in make_iter():
            rng, r1 = jax.random.split(rng)
            out = self._forward(self.variables, batch, r1)
            ir, n_corr = self._metrics(out, batch)
            irs.extend(np.asarray(ir).tolist())
            if metric_points_fn is not None:
                nfmrs.extend(self._nfmr_for_batch(out, batch, meta, metric_points_fn))
        summary = {"IR": float(np.mean(irs)) if irs else 0.0, "pairs": len(irs)}
        if nfmrs:
            summary["NFMR"] = float(np.mean(nfmrs))
        self.logger.info(f"4DMatch test: {summary}")
        return summary

    def _nfmr_for_batch(self, out, batch, meta, metric_points_fn):
        vals = []
        conf = out["conf_matrix_pred"]
        mask = thresholded_mutual_argmax_mask(conf, self.cfg.match_thr, mutual=True)
        mask = np.asarray(mask & batch.src_mask[:, :, None] & batch.tgt_mask[:, None, :])
        conf_np = np.asarray(conf)
        s_pcd = np.asarray(out["s_pcd"])
        t_pcd = np.asarray(out["t_pcd"])
        for i, m in enumerate(meta):
            mp = metric_points_fn(m)
            if mp is None:
                continue
            metric_pcd, metric_flow, metric_valid = mp
            rows, cols = np.nonzero(mask[i])
            a = self.cfg.max_corr
            if len(rows) > a:
                # keep the highest-confidence anchors, not the first rows
                order = np.argsort(-conf_np[i][rows, cols])[:a]
                rows, cols = rows[order], cols[order]
            anchor_src = np.zeros((a, 3), np.float32)
            anchor_tgt = np.zeros((a, 3), np.float32)
            anchor_valid = np.zeros(a, bool)
            n = len(rows)
            anchor_src[:n] = s_pcd[i][rows]
            anchor_tgt[:n] = t_pcd[i][cols]
            anchor_valid[:n] = True
            v = nfmr(jnp.asarray(metric_pcd), jnp.asarray(metric_flow),
                     batch.rot_gt[i], batch.trn_gt[i][:, 0],
                     jnp.asarray(anchor_src), jnp.asarray(anchor_tgt),
                     jnp.asarray(anchor_valid), jnp.asarray(metric_valid),
                     recall_thr=self.cfg.nfmr_recall_thr)
            vals.append(float(v))
        return vals
