"""Synthetic image<->cloud pairs for the 2D-3D pipeline (tests/bench).

Renders a synthetic depth map of a blobby scene, back-projects it for the
image side, samples a point cloud of the same scene in a world frame related
by a known rigid transform, and builds the 3-level point pyramid.
"""
from __future__ import annotations

import numpy as np

from ..ops.neighbors import radius_neighbors_np
from .batch import pad_to
from .native import grid_subsample_native, radius_neighbors_native
from .synthetic import random_rotation


def _pyramid_3lvl(points, caps, ks, radius0):
    """Build 3-level pyramid arrays for one cloud, padded to caps."""
    levels = [points]
    r = radius0
    radii = [r]
    for _ in range(2):
        dl = 2 * r / 2.5
        levels.append(grid_subsample_native(levels[-1], dl))
        r *= 2
        radii.append(r)

    pts, masks, neigh, pools, ups = [], [], [], [], []
    for l in range(3):
        n_real = len(levels[l])
        if n_real > caps[l]:
            raise ValueError(f"2d3d bucket too small at level {l}")
        pts.append(pad_to(levels[l].astype(np.float32), caps[l]))
        masks.append(np.arange(caps[l]) < n_real)
        idx = radius_neighbors_native(levels[l], levels[l], radii[l], ks[l])
        idx = np.where(idx >= n_real, caps[l], idx)
        neigh.append(pad_to(idx, caps[l], fill=caps[l]))
        if l < 2:
            pi = radius_neighbors_native(levels[l + 1], levels[l], radii[l], ks[l])
            pi = np.where(pi >= len(levels[l]), caps[l], pi)
            pools.append(pad_to(pi, caps[l + 1], fill=caps[l]))
            ui = radius_neighbors_native(levels[l], levels[l + 1], 2 * radii[l], 4)
            ui = np.where(ui >= len(levels[l + 1]), caps[l + 1], ui)
            ups.append(pad_to(ui, caps[l], fill=caps[l + 1]))
    return pts, masks, neigh, pools, ups


def synthetic_2d3d_batch(batch_size=1, img_hw=(64, 96), n_points=512, seed=0,
                         coarse_stride=8, n_gt=64, as_jnp=True,
                         with_full_gt=False, n_overlap=256, n_fine_gt=64,
                         gt_radius_3d=0.05, with_dino=False, dino_dim=1024,
                         with_mono_depth=False):
    """``with_full_gt`` additionally builds the overlap-ratio pairs and the
    fine pixel<->point GT via the real collate helpers (collate2d3d).
    ``with_dino`` / ``with_mono_depth`` attach synthetic tower outputs
    (random DINO patch tokens at stride 14; the true depth as a stand-in
    DepthAnything map) for exercising the frozen-tower paths end-to-end."""
    import jax.numpy as jnp

    from ..models.pipeline_2d3d import Batch2D3D

    rng = np.random.RandomState(seed)
    h, w = img_hw
    fx = fy = 0.8 * w
    cx, cy = w / 2.0, h / 2.0
    intrinsics = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    # sparse synthetic clouds barely merge under subsampling: uniform caps
    caps = (n_points, n_points, n_points)
    ks = (16, 16, 16)

    images, img_points_l, img_valid_l = [], [], []
    pyrs, feats_l, transforms = [], [], []
    gts, dinos, monos = [], [], []

    for b in range(batch_size):
        # smooth random depth map
        # ceil the low-res grid and crop: h/w need not be multiples of 8
        # (the 2d3d bench drives the 476x630-class shapes at stride-14 crops)
        base = rng.rand(-(-h // 8), -(-w // 8)).astype(np.float32)
        depth = (np.kron(base, np.ones((8, 8), np.float32)) * 1.5 + 1.0)[:h, :w]
        img = (depth - depth.min()) / (np.ptp(depth) + 1e-6)

        # back-project (host, numpy mirror of ops.vision.back_project)
        vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        z = depth.reshape(-1)
        x = (uu.reshape(-1) - cx) * z / fx
        y = (vv.reshape(-1) - cy) * z / fy
        cam_pts = np.stack([x, y, z], -1).astype(np.float32)
        valid = z > 0

        # cloud = subset of the camera points in a world frame
        sel = rng.permutation(h * w)[:n_points]
        rot = random_rotation(rng)
        trn = rng.randn(3, 1).astype(np.float32) * 0.2
        # transform: cam_from_world, i.e. cam = R @ world + t
        world_pts = ((cam_pts[sel] - trn.T) @ rot)  # inverse transform
        tfm = np.eye(4, dtype=np.float32)
        tfm[:3, :3] = rot
        tfm[:3, 3] = trn[:, 0]

        pts, masks, neigh, pools, ups = _pyramid_3lvl(world_pts, caps, ks, 0.3)

        # GT coarse correspondences: nearest patch center for each node
        nodes = pts[2][masks[2]]
        nodes_cam = nodes @ rot.T + trn.T
        hc, wc = h // coarse_stride, w // coarse_stride
        centers = cam_pts.reshape(h // coarse_stride, coarse_stride,
                                  w // coarse_stride, coarse_stride, 3)
        centers = centers.transpose(0, 2, 1, 3, 4).reshape(hc * wc, -1, 3).mean(axis=1)
        d = np.linalg.norm(nodes_cam[:, None] - centers[None], axis=-1)
        nn_idx = d.argmin(1)
        ok = d.min(1) < 0.4
        gt_src = np.zeros(n_gt, np.int32)
        gt_tgt = np.zeros(n_gt, np.int32)
        gt_val = np.zeros(n_gt, bool)
        m = min(int(ok.sum()), n_gt)
        rows = np.nonzero(ok)[0][:m]
        gt_src[:m] = rows
        gt_tgt[:m] = nn_idx[rows]
        gt_val[:m] = True

        images.append(img[..., None])
        img_points_l.append(cam_pts)
        img_valid_l.append(valid)
        if with_dino:
            g14 = (max(1, h // 14), max(1, w // 14))
            dinos.append(rng.randn(*g14, dino_dim).astype(np.float32) * 0.02)
        if with_mono_depth:
            # stand-in DepthAnything output: true depth x 100 (the pipeline
            # rescales by mono_depth_scale=0.01, so the affine (1, 0) lifts
            # back to the true camera points)
            monos.append(depth * 100.0)
        pyrs.append((pts, masks, neigh, pools, ups))
        feats_l.append(pad_to(np.ones((len(world_pts), 1), np.float32), caps[0]))
        transforms.append(tfm)

        if with_full_gt:
            from .collate2d3d import fine_gt_correspondences, node_patch_overlaps

            ov = node_patch_overlaps(
                world_pts, nodes, cam_pts, valid, tfm, intrinsics,
                (h, w), coarse_stride, matching_radius_3d=gt_radius_3d,
                matching_radius_2d=8.0, num_points_in_patch=32,
                max_pairs=n_overlap)
            fine = fine_gt_correspondences(
                cam_pts, valid, world_pts, tfm, intrinsics, (h, w),
                n_fine_gt, matching_radius_3d=gt_radius_3d,
                matching_radius_2d=8.0, rng=rng)
            gts.append((gt_src, gt_tgt, gt_val, ov, fine))
        else:
            gts.append((gt_src, gt_tgt, gt_val))

    conv = (lambda a: jnp.asarray(np.stack(a))) if as_jnp else (lambda a: np.stack(a))
    stack_lvl = lambda i, part: conv([p[part][i] for p in pyrs])

    extra = {}
    if with_dino:
        extra["dino_feats"] = conv(dinos)
    if with_mono_depth:
        extra["mono_depth"] = conv(monos)
    if with_full_gt:
        extra |= {
            "ov_src": conv([g[3][0] for g in gts]),
            "ov_tgt": conv([g[3][1] for g in gts]),
            "ov_min": conv([g[3][2] for g in gts]),
            "ov_max": conv([g[3][3] for g in gts]),
            "ov_valid": conv([g[3][4] for g in gts]),
            "fine_pixels": conv([g[4][0] for g in gts]),
            "fine_pcd_idx": conv([g[4][1] for g in gts]),
            "fine_valid": conv([g[4][2] for g in gts]),
        }

    return Batch2D3D(
        image=conv(images),
        img_points=conv(img_points_l),
        img_valid=conv(img_valid_l),
        points=tuple(stack_lvl(i, 0) for i in range(3)),
        masks=tuple(stack_lvl(i, 1) for i in range(3)),
        neighbors=tuple(stack_lvl(i, 2) for i in range(3)),
        pools=tuple(stack_lvl(i, 3) for i in range(2)),
        upsamples=tuple(stack_lvl(i, 4) for i in range(2)),
        pcd_feats=conv(feats_l),
        transform=conv(transforms),
        intrinsics=conv([intrinsics] * batch_size),
        gt_src=conv([g[0] for g in gts]),
        gt_tgt=conv([g[1] for g in gts]),
        gt_valid=conv([g[2] for g in gts]),
        **extra,
    )
