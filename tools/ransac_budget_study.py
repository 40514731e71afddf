"""Device-RANSAC hypothesis-budget study (VERDICT-r3 "weak #7").

The reference estimates pose with Open3D correspondence-RANSAC at 50k
iterations + early-exit confidence (models/loss.py:13-23); our device twin
(eval/ransac.py) draws a FIXED batch of hypotheses on the MXU. This study
answers "is 8192-16384 enough?" without the (absent-offline) benchmark
data, by sweeping the budget over correspondence sets with controlled
inlier ratios matching published 3DMatch statistics (IR ~31% mean at
RR 95%, hard pairs down to ~5%):

* empirical success@(RRE<5deg, RTE<0.1) of `ransac_pose` vs budget,
* the analytic all-inlier-triple coverage 1-(1-ir^3)^H for context —
  the device estimator beats it because 2-refinement rounds rescue
  near-miss hypotheses,
* the minimum budget reaching >=99% of its asymptotic success per IR.

Open3D itself is not installed in this image (the host twin in
eval/host_estimators.py is import-guarded); on a machine that has it, pass
--o3d to add the reference estimator on the same correspondence sets.

Run:  python tools/ransac_budget_study.py [--trials 24] [--o3d]
Env:  DIFFREG_FORCE_CPU=1 forces the CPU backend (tunnel-down safe).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corr_set(rng: np.random.RandomState, n_corr: int, inlier_ratio: float,
                  noise: float = 0.01):
    """Synthetic correspondence set with a known pose and contamination.

    Outliers are arbitrary point pairs inside the same scene extent — the
    hardest (structured) case for a correspondence RANSAC, matching what
    top-1 union extraction produces on non-overlap rows (reference design:
    IR is bounded by the overlap fraction).
    """
    from diffreg_tpu.data.synthetic import random_rotation

    rot = random_rotation(rng)
    trn = rng.randn(3) * 0.5
    src = rng.rand(n_corr, 3).astype(np.float32) * 3.0
    tgt = (src @ rot.T + trn).astype(np.float32)
    n_in = int(round(n_corr * inlier_ratio))
    tgt[:n_in] += rng.randn(n_in, 3).astype(np.float32) * noise
    tgt[n_in:] = rng.rand(n_corr - n_in, 3).astype(np.float32) * 3.0
    # score-sorted-valid-first contract: shuffle so inliers are not a prefix
    perm = rng.permutation(n_corr)
    return src[perm], tgt[perm], rot.astype(np.float32), trn.astype(np.float32)


def main():
    if os.environ.get("DIFFREG_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    argv = sys.argv[1:]
    trials = int(argv[argv.index("--trials") + 1]) if "--trials" in argv else 24
    use_o3d = "--o3d" in argv

    import jax
    import jax.numpy as jnp

    from diffreg_tpu.eval.ransac import ransac_pose
    from diffreg_tpu.geometry import rotation_error_deg

    n_corr = 512                       # extract_correspondences cap in the testers
    budgets = [1024, 2048, 4096, 8192, 16384, 32768]
    ratios = [0.05, 0.10, 0.20, 0.30]

    def run(src, tgt, valid, key, h):
        return ransac_pose(key, src, tgt, valid, distance_threshold=0.05,
                           num_hypotheses=h)

    jitted = {h: jax.jit(lambda s, t, v, k, h=h: run(s, t, v, k, h))
              for h in budgets}

    report = {"n_corr": n_corr, "trials": trials, "budgets": budgets,
              "ratios": {}}
    valid = jnp.ones(n_corr, bool)
    for ir in ratios:
        rng = np.random.RandomState(int(ir * 1000))
        sets = [make_corr_set(rng, n_corr, ir) for _ in range(trials)]
        row = {}
        for h in budgets:
            succ = 0
            for i, (src, tgt, rot, trn) in enumerate(sets):
                res = jitted[h](jnp.asarray(src), jnp.asarray(tgt), valid,
                                jax.random.PRNGKey(1000 + i))
                rre = float(rotation_error_deg(
                    jnp.asarray(res.rotation)[None], jnp.asarray(rot)[None])[0])
                rte = float(np.linalg.norm(
                    np.asarray(res.translation).reshape(3) - trn))
                succ += (rre < 5.0) and (rte < 0.1)
            analytic = 1.0 - (1.0 - ir ** 3) ** h
            row[h] = {"success": succ / trials,
                      "analytic_triple_coverage": analytic}
            print(f"IR {ir:.2f}  H={h:6d}: success {succ}/{trials} "
                  f"(analytic all-inlier-triple {analytic:.3f})", flush=True)
        # minimum budget within 1 trial of the best observed success
        best = max(v["success"] for v in row.values())
        min_h = min(h for h in budgets
                    if row[h]["success"] >= best - 1.0 / trials)
        row["min_budget_for_asymptote"] = min_h
        report["ratios"][f"{ir:.2f}"] = row
        print(f"IR {ir:.2f}: asymptotic success {best:.3f}, reached by "
              f"H={min_h}", flush=True)

        if use_o3d:
            from diffreg_tpu.eval.host_estimators import ransac_pose_open3d

            succ = 0
            corr = np.stack([np.arange(n_corr), np.arange(n_corr)], axis=1)
            for src, tgt, rot, trn in sets:
                tsfm = ransac_pose_open3d(src, tgt, corr,
                                          distance_threshold=0.05)
                rre = float(rotation_error_deg(
                    jnp.asarray(tsfm[:3, :3])[None], jnp.asarray(rot)[None])[0])
                succ += (rre < 5.0) and (np.linalg.norm(tsfm[:3, 3] - trn) < 0.1)
            row["open3d_50k"] = succ / trials
            print(f"IR {ir:.2f}  open3d(50k): success {succ}/{trials}")

    print(json.dumps(report))


if __name__ == "__main__":
    main()
