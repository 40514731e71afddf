"""2D-3D collate: raw sample dicts -> padded Batch2D3D.

Replaces vision3d's GraphPyramid2D3DRegistrationCollateFn (vision3d/utils/
collate.py:265-310): back-project the depth map (host numpy), build the
3-level cloud pyramid with the native kernels, compute coarse GT node<->patch
correspondences, pad everything to a static 2D-3D ShapeSpec.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from .batch import pad_to
from .native import grid_subsample_native, radius_neighbors_native


@dataclasses.dataclass(frozen=True)
class Spec2D3D:
    n_points: Tuple[int, int, int]
    k_neighbors: Tuple[int, int, int] = (32, 32, 32)
    k_pools: Tuple[int, int] = (32, 32)
    k_upsamples: Tuple[int, int] = (4, 4)
    n_gt: int = 256
    init_radius: float = 0.0625     # 2.5 * 2.5cm voxel (config.py KPConv)


def _back_project_np(depth, intrinsics, depth_limit=6.0):
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth.reshape(-1)
    x = (uu.reshape(-1) - cx) * z / fx
    y = (vv.reshape(-1) - cy) * z / fy
    pts = np.stack([x, y, z], -1).astype(np.float32)
    valid = (z > 0) & (z <= depth_limit)
    return pts, valid


def node_patch_overlaps(
    points: np.ndarray,          # [N0, 3] cloud points (cloud frame)
    nodes: np.ndarray,           # [Nc, 3] coarse nodes
    img_points: np.ndarray,      # [H*W, 3] back-projected depth (cam frame)
    img_valid: np.ndarray,       # [H*W]
    transform: np.ndarray,       # [4, 4] cam-from-cloud
    intrinsics: np.ndarray,
    hw: Tuple[int, int],
    stride: int,
    matching_radius_3d: float = 0.0375,
    max_pairs: int = 1024,
):
    """GT node<->patch overlap ratios (reference get_2d3d_node_correspondences,
    experiments utils.py:59-173, simplified to the 3D-overlap criterion).

    For each (node, patch) candidate: the 3D overlap is the fraction of the
    node's member points (in camera space) within ``matching_radius_3d`` of
    the patch's valid depth points; the 2D overlap is the fraction of the
    patch's depth points within the radius of the node's members. Returns
    padded (node_idx, patch_idx, min_overlap, max_overlap, valid).
    """
    from scipy.spatial import cKDTree

    h, w = hw
    hp, wp = h // stride, w // stride

    # node membership of fine points
    tree_nodes = cKDTree(nodes)
    _, p2n = tree_nodes.query(points, k=1)

    cam_pts = points @ transform[:3, :3].T + transform[:3, 3]

    # patch membership of image pixels
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    patch_of_pixel = (vv // stride) * wp + (uu // stride)
    patch_of_pixel = patch_of_pixel.reshape(-1)

    pairs = []
    img_tree = cKDTree(img_points[img_valid]) if img_valid.any() else None
    patch_ids_valid = patch_of_pixel[img_valid]
    if img_tree is None:
        return (np.zeros(max_pairs, np.int32), np.zeros(max_pairs, np.int32),
                np.zeros(max_pairs, np.float32), np.zeros(max_pairs, np.float32),
                np.zeros(max_pairs, bool))

    for ni in range(len(nodes)):
        members = cam_pts[p2n == ni]
        if len(members) == 0:
            continue
        # which patches do the members land near?
        neigh_lists = img_tree.query_ball_point(members, matching_radius_3d)
        hit_patches = {}
        hit_any = np.zeros(len(members), bool)
        for mi, lst in enumerate(neigh_lists):
            if lst:
                hit_any[mi] = True
                for j in lst:
                    hit_patches.setdefault(patch_ids_valid[j], set()).add(mi)
        for pj, member_set in hit_patches.items():
            ratio_3d = len(member_set) / len(members)
            # 2D side: fraction of the patch's depth points near the node members
            patch_pt_idx = np.nonzero(patch_ids_valid == pj)[0]
            if len(patch_pt_idx) == 0:
                continue
            m_tree = cKDTree(members)
            d, _ = m_tree.query(img_points[img_valid][patch_pt_idx], k=1)
            ratio_2d = float((d <= matching_radius_3d).mean())
            pairs.append((ni, int(pj), min(ratio_3d, ratio_2d), max(ratio_3d, ratio_2d)))

    pairs.sort(key=lambda t: -t[3])
    n = min(len(pairs), max_pairs)
    node_idx = np.zeros(max_pairs, np.int32)
    patch_idx = np.zeros(max_pairs, np.int32)
    min_ov = np.zeros(max_pairs, np.float32)
    max_ov = np.zeros(max_pairs, np.float32)
    valid = np.zeros(max_pairs, bool)
    for i in range(n):
        node_idx[i], patch_idx[i], min_ov[i], max_ov[i] = pairs[i]
        valid[i] = True
    return node_idx, patch_idx, min_ov, max_ov, valid


def build_2d3d_sample(raw: dict, spec: Spec2D3D, coarse_stride: int = 8,
                      gt_radius: float = 0.15) -> dict:
    """One raw dataset dict -> padded arrays for Batch2D3D."""
    points = raw["points"]
    depth = raw["depth"]
    intrinsics = raw["intrinsics"]
    transform = raw["transform"]
    h, w = depth.shape
    assert h % coarse_stride == 0 and w % coarse_stride == 0, \
        f"crop {h}x{w} must divide stride {coarse_stride}"

    img_points, img_valid = _back_project_np(depth, intrinsics)

    # --- cloud pyramid (3 levels) ---
    levels = [points]
    r = spec.init_radius
    radii = [r]
    for _ in range(2):
        dl = 2 * r / 2.5
        levels.append(grid_subsample_native(levels[-1], dl))
        r *= 2
        radii.append(r)

    pts_l, masks_l, neigh_l, pools_l, ups_l = [], [], [], [], []
    for l in range(3):
        n_real = len(levels[l])
        cap = spec.n_points[l]
        if n_real > cap:
            raise ValueError(f"2d3d bucket too small at level {l}: {n_real} > {cap}")
        pts_l.append(pad_to(levels[l].astype(np.float32), cap))
        masks_l.append(np.arange(cap) < n_real)
        idx = radius_neighbors_native(levels[l], levels[l], radii[l], spec.k_neighbors[l])
        idx = np.where(idx >= n_real, cap, idx)
        neigh_l.append(pad_to(idx, cap, fill=cap))
        if l < 2:
            pi = radius_neighbors_native(levels[l + 1], levels[l], radii[l], spec.k_pools[l])
            pi = np.where(pi >= n_real, spec.n_points[l], pi)
            pools_l.append(pad_to(pi, spec.n_points[l + 1], fill=spec.n_points[l]))
            ui = radius_neighbors_native(levels[l], levels[l + 1], 2 * radii[l],
                                         spec.k_upsamples[l])
            ui = np.where(ui >= len(levels[l + 1]), spec.n_points[l + 1], ui)
            ups_l.append(pad_to(ui, cap, fill=spec.n_points[l + 1]))

    # --- coarse GT: nodes (cam frame) <-> patch centers of real depth ---
    nodes = levels[2]
    nodes_cam = nodes @ transform[:3, :3].T + transform[:3, 3]
    hc, wc = h // coarse_stride, w // coarse_stride
    centers = img_points.reshape(hc, coarse_stride, wc, coarse_stride, 3)
    val = img_valid.reshape(hc, coarse_stride, wc, coarse_stride)
    cnt = np.maximum(val.sum((1, 3)), 1)[..., None]
    centers = (centers * val[..., None]).sum((1, 3)) / cnt
    centers = centers.reshape(hc * wc, 3)

    from scipy.spatial import cKDTree

    tree = cKDTree(centers)
    d, nn = tree.query(nodes_cam, k=1)
    ok = d <= gt_radius
    g = spec.n_gt
    n_m = min(int(ok.sum()), g)
    rows = np.nonzero(ok)[0][:n_m]
    gt_src = np.zeros(g, np.int32)
    gt_tgt = np.zeros(g, np.int32)
    gt_val = np.zeros(g, bool)
    gt_src[:n_m] = rows
    gt_tgt[:n_m] = nn[rows]
    gt_val[:n_m] = True

    feats = pad_to(raw["feats"].astype(np.float32), spec.n_points[0])

    return {
        "image": raw["image_gray"][..., None].astype(np.float32),
        "img_points": img_points,
        "img_valid": img_valid,
        "points": tuple(pts_l),
        "masks": tuple(masks_l),
        "neighbors": tuple(neigh_l),
        "pools": tuple(pools_l),
        "upsamples": tuple(ups_l),
        "pcd_feats": feats,
        "transform": transform.astype(np.float32),
        "intrinsics": intrinsics.astype(np.float32),
        "gt_src": gt_src,
        "gt_tgt": gt_tgt,
        "gt_valid": gt_val,
    }


def batch_2d3d(samples: Sequence[dict], as_jnp: bool = True):
    import jax.numpy as jnp

    from .batch import stack_pairs
    from ..models.pipeline_2d3d import Batch2D3D

    stacked = stack_pairs(list(samples))
    conv = (lambda a: jnp.asarray(a)) if as_jnp else (lambda a: a)

    def c(x):
        return tuple(conv(v) for v in x) if isinstance(x, tuple) else conv(x)

    return Batch2D3D(**{k: c(v) for k, v in stacked.items()})
