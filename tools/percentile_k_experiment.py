"""Neighbor-K percentile experiment: gate lowering calibrate_spec's percentile.

The reference calibrates ragged neighbor caps at the 90th percentile of the
neighborhood-size histogram (datasets/dataloader.py:562-589). On TPU the cap
IS the static gather width, and the backbone's ~150 ms irreducible gather
cost scales with it (ROADMAP "Remaining perf levers" #2). This tool answers
whether a lower percentile (default 80) is safe:

1. **Geometric gate** (default, ~1 min, no jax): per level, the exact
   KPConv influence mass lost by truncating radius neighborhoods at K(pct),
   computed with the live kernel-point dispositions, extent formula
   (nn/kpfcn.py:187) and linear influence (ops/kpconv.py:131-132) — plus
   the gather-row cost model so the savings claim is explicit. Truncation
   drops the FARTHEST neighbors (lists are nearest-first,
   ops/neighbors.py:85-95), which carry the least influence, so the lost
   mass is far smaller than the lost row fraction.
2. **Metric gate** (``--metric [steps]``, minutes): train the
   small-but-full model once under the 90th-percentile spec, then evaluate
   the SAME held-out pairs with pyramids built under BOTH specs (params
   are K-independent). Reports held-out registration success@5deg + IR
   through the full DDIM + RANSAC path — the number that must not move.

Run:  python tools/percentile_k_experiment.py [--pct 80] [--metric [steps]]
Env:  DIFFREG_FORCE_CPU=1 forces the CPU backend before first jax use
      (tunnel-down safe); the geometric gate never touches jax.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def geometric_gate(pct: float, n_pairs: int = 4, n_points: int = 4096,
                   queries_per_cloud: int = 512):
    from scipy.spatial import cKDTree

    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig
    from diffreg_tpu.data.synthetic import make_pair
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.kernel_points import load_kernel_points
    from diffreg_tpu.ops.subsample import grid_subsample_np

    kcfg = preset_3dmatch().kpfcn
    pcfg = PyramidConfig(first_subsampling_dl=0.03, coarse_match_radius=0.1)
    cal_rng = np.random.RandomState(0)
    cal_pairs = [make_pair(cal_rng, n_points)[:2] for _ in range(2)]
    spec90 = calibrate_spec(cal_pairs, pcfg, k_cap=40, neighbor_percentile=90.0)
    specP = calibrate_spec(cal_pairs, pcfg, k_cap=40, neighbor_percentile=pct)
    print(f"K/level  @90: conv {spec90.k_neighbors} pool {spec90.k_pools}")
    print(f"K/level @{pct:.0f}: conv {specP.k_neighbors} pool {specP.k_pools}")

    # gather-row cost model: each conv gathers n_points[l] * K rows, each
    # strided conv n_points[l+1] * K_pool rows; cost is per ROW regardless
    # of row bytes (ROADMAP kernel findings)
    def rows(spec):
        L = len(spec.n_points)
        return (sum(spec.n_points[l] * spec.k_neighbors[l] for l in range(L))
                + sum(spec.n_points[l + 1] * spec.k_pools[l]
                      for l in range(L - 1)))

    r90, rP = rows(spec90), rows(specP)
    print(f"gather rows @90: {r90/1e6:.2f}M  @{pct:.0f}: {rP/1e6:.2f}M  "
          f"savings {(1 - rP/r90)*100:.1f}%")

    # exact influence-mass loss with live dispositions/extent
    eval_rng = np.random.RandomState(1)
    L = pcfg.num_levels
    lost_mass = [[] for _ in range(L)]   # per-query lost influence fraction
    lost_rows = [[] for _ in range(L)]   # per-query dropped-neighbor fraction
    for _ in range(n_pairs):
        src, tgt = make_pair(eval_rng, n_points)[:2]
        levels = [np.concatenate([src, tgt]).astype(np.float32)]
        # per-side subsampling like the pyramid builder (src/tgt independent)
        s_l, t_l = [src.astype(np.float32)], [tgt.astype(np.float32)]
        r = pcfg.first_subsampling_dl * pcfg.conv_radius
        radii = []
        for _ in range(L - 1):
            radii.append(r)
            dl = 2 * r / pcfg.conv_radius
            s_l.append(grid_subsample_np(s_l[-1], dl))
            t_l.append(grid_subsample_np(t_l[-1], dl))
            r *= 2
        radii.append(r)

        for l in range(L):
            # live formulas: disposition scale = layer radius
            # (nn/kpfcn.py:124), extent = radius * kp_extent / conv_radius
            # (nn/kpfcn.py:187)
            kp = load_kernel_points(radii[l], kcfg.num_kernel_points,
                                    kcfg.in_points_dim,
                                    kcfg.fixed_kernel_points)
            extent = radii[l] * kcfg.kp_extent / kcfg.conv_radius
            kq = specP.k_neighbors[l]
            for cloud in (s_l[l], t_l[l]):
                tree = cKDTree(cloud)
                perm = np.random.RandomState(0).permutation(len(cloud))
                q = cloud[perm[:queries_per_cloud]]
                for qi, nbrs in enumerate(tree.query_ball_point(q, radii[l])):
                    if len(nbrs) <= kq:
                        lost_mass[l].append(0.0)
                        lost_rows[l].append(0.0)
                        continue
                    d = cloud[nbrs] - q[qi]                       # [n, 3]
                    dist_kp = np.linalg.norm(
                        d[:, None, :] - kp[None, :, :], axis=-1)  # [n, P]
                    infl = np.clip(1.0 - dist_kp / extent, 0.0, None).sum(1)
                    keep = np.argsort(np.linalg.norm(d, axis=-1))[:kq]
                    tot = infl.sum()
                    lost_mass[l].append(
                        0.0 if tot <= 0 else 1.0 - infl[keep].sum() / tot)
                    lost_rows[l].append(1.0 - kq / len(nbrs))
    print(f"per-level truncation @{pct:.0f}th (mean / p99 over "
          f"{len(lost_mass[0])} queries):")
    summary = []
    for l in range(L):
        lm, lr = np.asarray(lost_mass[l]), np.asarray(lost_rows[l])
        print(f"  level {l}: influence mass lost {lm.mean()*100:6.2f}% "
              f"(p99 {np.percentile(lm, 99)*100:5.1f}%)   rows dropped "
              f"{lr.mean()*100:6.2f}%")
        summary.append({"level": l, "mass_lost_mean": float(lm.mean()),
                        "mass_lost_p99": float(np.percentile(lm, 99)),
                        "rows_dropped_mean": float(lr.mean())})
    return spec90, specP, {"rows_90": r90, "rows_pct": rP, "levels": summary}


def metric_gate(pct: float, steps: int):
    """Train @90, evaluate held-out pairs under both specs; report deltas."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffreg_tpu.data.calibrate import calibrate_spec
    from diffreg_tpu.data.pyramid import PyramidConfig, batch_from_samples, build_pair_pyramid
    from diffreg_tpu.data.synthetic import make_pair
    from diffreg_tpu.engine import (LossConfig, OptimConfig, create_train_state,
                                    make_train_step)
    from diffreg_tpu.eval import ransac_pose
    from diffreg_tpu.eval.metrics import masked_inlier_ratio
    from diffreg_tpu.geometry import rotation_error_deg
    from diffreg_tpu.models import DiffusionMatchingModel
    from diffreg_tpu.models.presets import preset_3dmatch
    from diffreg_tpu.ops.select import extract_correspondences

    n_points, bsz = 512, 8
    pcfg = PyramidConfig(first_subsampling_dl=0.06, coarse_match_radius=0.15)
    cal_rng = np.random.RandomState(0)
    cal_pairs = [make_pair(cal_rng, n_points)[:2] for _ in range(8)]
    spec90 = calibrate_spec(cal_pairs, pcfg, k_cap=40, neighbor_percentile=90.0)
    specP = calibrate_spec(cal_pairs, pcfg, k_cap=40, neighbor_percentile=pct)
    # identical padded point/token sizes: only the K axes differ between
    # the two specs (jit retraces once per K set — two compiles total)
    specP = dataclasses.replace(
        specP, n_points=spec90.n_points, n_src=spec90.n_src,
        n_tgt=spec90.n_tgt, n_gt_matches=spec90.n_gt_matches,
        k_upsamples=spec90.k_upsamples,
        k_neighbors=tuple(min(a, b) for a, b in
                          zip(specP.k_neighbors, spec90.k_neighbors)),
        k_pools=tuple(min(a, b) for a, b in
                      zip(specP.k_pools, spec90.k_pools)))
    print(f"metric gate: K {spec90.k_neighbors} -> {specP.k_neighbors}, "
          f"pools {spec90.k_pools} -> {specP.k_pools}")

    def build_batches(seed0, n_batches, spec):
        rng = np.random.RandomState(seed0)
        out = []
        for _ in range(n_batches):
            samples = []
            for _ in range(bsz):
                src, tgt, rot, trn, _ = make_pair(rng, n_points)
                samples.append(build_pair_pyramid(src, tgt, rot, trn, pcfg, spec))
            out.append(batch_from_samples(samples))
        return out

    # the small-but-full shrink used by the overfit/training-story tools
    base = preset_3dmatch(sample_steps=10, train=True)
    matching = dataclasses.replace(base.coarse_matching, feature_dim=96)
    transformer = dataclasses.replace(
        base.coarse_transformer, feature_dim=96, n_head=4,
        feature_matching=matching, flash_attention=False,
        compute_dtype="bfloat16")
    kpfcn = dataclasses.replace(base.kpfcn, first_feats_dim=64,
                                coarse_feature_dim=96, fine_feature_dim=32,
                                first_subsampling_dl=pcfg.first_subsampling_dl,
                                compute_dtype="bfloat16")
    cfg = dataclasses.replace(base, kpfcn=kpfcn, coarse_transformer=transformer,
                              coarse_matching=matching)
    model = DiffusionMatchingModel(cfg)

    train = build_batches(7, 6, spec90)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, train[0], rng, OptimConfig(optimizer="adam", lr=1e-3))
    step = jax.jit(make_train_step(model, LossConfig(),
                                   OptimConfig(optimizer="adam", lr=1e-3)))
    keys = np.asarray(jax.random.split(rng, steps))
    for i in range(steps):
        state, info = step(state, train[i % len(train)], jnp.asarray(keys[i]))
        if (i + 1) % 100 == 0:
            print(f"  step {i+1}: loss={float(info['loss']):.4f}", flush=True)

    def _eval(variables, batch):
        out = model.apply(variables, batch, jax.random.PRNGKey(99), mode="ddim")

        def one(conf, mask, s_pcd, t_pcd, rot_gt, trn_gt):
            ir = masked_inlier_ratio(mask, s_pcd, t_pcd, rot_gt, trn_gt[:, 0],
                                     inlier_thr=0.1)
            corrs = extract_correspondences(mask, conf, 512)
            res = ransac_pose(jax.random.PRNGKey(7), s_pcd[corrs.src_idx],
                              t_pcd[corrs.tgt_idx], corrs.valid,
                              distance_threshold=0.05, num_hypotheses=4096)
            return rotation_error_deg(res.rotation[None], rot_gt[None])[0], ir

        return jax.vmap(one)(out["conf_matrix_pred"], out["corr_mask"],
                             out["s_pcd"], out["t_pcd"], batch.rot_gt,
                             batch.trn_gt)

    eval_fn = jax.jit(_eval)
    variables = {"params": state.params, "buffers": state.buffers}
    result = {}
    for tag, spec in (("pct90", spec90), (f"pct{pct:.0f}", specP)):
        # SAME held-out raw pairs, pyramids rebuilt under each spec
        rres, irs = [], []
        for b in build_batches(10_000, 2, spec):
            rre, ir = eval_fn(variables, b)
            rres.append(np.asarray(rre))
            irs.append(np.asarray(ir))
        rres, irs = np.concatenate(rres), np.concatenate(irs)
        result[tag] = {"success_at_5deg": float((rres < 5.0).mean()),
                       "ir_mean": float(irs.mean())}
        print(f"  {tag}: success@5deg={result[tag]['success_at_5deg']:.3f} "
              f"IR={result[tag]['ir_mean']:.3f}  RRE {np.round(rres, 1)}")
    return result


def main():
    if os.environ.get("DIFFREG_FORCE_CPU"):
        # tunnel-down escape hatch (ROADMAP "Known environment quirks");
        # must run before first backend use
        import jax

        jax.config.update("jax_platforms", "cpu")
    argv = sys.argv[1:]
    pct = float(argv[argv.index("--pct") + 1]) if "--pct" in argv else 80.0
    spec90, specP, geo = geometric_gate(pct)
    out = {"pct": pct, "geometric": geo}
    if "--metric" in argv:
        i = argv.index("--metric")
        steps = int(argv[i + 1]) if i + 1 < len(argv) and argv[i + 1].isdigit() else 400
        out["metric"] = metric_gate(pct, steps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
