"""2D<->3D geometry ops: back-projection, rendering, patchify, meshgrid.

Re-implements the vision3d op layer used by the 2D-3D branch
(Diff-Reg-2d3d/vision3d/ops/back_project.py:7-55, render.py:9-58,
meshgrid; experiments/.../utils.py:28-55 patchify) with static shapes and
validity masks instead of boolean indexing.

Convention: intrinsics K = [[fx, 0, cx], [0, fy, cy], [0, 0, 1]]; pixels are
(row, col) = (v, u) ordered where noted, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def create_meshgrid(height, width, normalized=False, flatten=False, centered=False):
    """Pixel coordinate grid [H, W, 2] in (v, u) order.

    Normalized non-centered coordinates are an INCLUSIVE linspace over
    [0, 1] — the reference uses torch.linspace(0, 1, steps=H) there
    (vision3d/ops/meshgrid.py:18-22), which feeds the fusion module's
    Fourier embeddings; arange/H would shift every embedding.
    """
    if normalized and not centered:
        v = jnp.linspace(0.0, 1.0, height)
        u = jnp.linspace(0.0, 1.0, width)
    else:
        v = jnp.arange(height, dtype=jnp.float32)
        u = jnp.arange(width, dtype=jnp.float32)
        if centered:
            v = v + 0.5
            u = u + 0.5
        if normalized:
            v = v / height
            u = u / width
    grid = jnp.stack(jnp.meshgrid(v, u, indexing="ij"), axis=-1)  # [H, W, 2]
    if flatten:
        grid = grid.reshape(-1, 2)
    return grid


def resize_align_corners(x, hw):
    """Bilinear resize with torch align_corners=True semantics ([B,H,W,C]).

    jax.image.resize uses half-pixel centers (align_corners=False); the
    reference image paths interpolate with align_corners=True
    (image_backbone.py:193-213, model.py:375), so the grid is built
    explicitly and sampled via map_coordinates.
    """
    b, h, w, c = x.shape
    nh, nw = hw
    if (nh, nw) == (h, w):
        return x
    rows = jnp.linspace(0.0, h - 1.0, nh)
    cols = jnp.linspace(0.0, w - 1.0, nw)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")

    def one(img):  # [H, W]
        return jax.scipy.ndimage.map_coordinates(img, [rr, cc], order=1)

    return jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1), in_axes=0)(x)


def back_project(depth, intrinsics, depth_limit=6.0, depth_min=0.0):
    """Depth map -> camera-space points.

    Args:
      depth: [H, W] depth in meters (0 = invalid).
      intrinsics: [3, 3].

    Returns:
      points [H*W, 3], valid [H*W] (0 < d <= depth_limit).
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    grid = create_meshgrid(h, w, flatten=True)          # [HW, 2] (v, u)
    d = depth.reshape(-1)
    x = (grid[:, 1] - cx) * d / fx
    y = (grid[:, 0] - cy) * d / fy
    pts = jnp.stack([x, y, d], axis=-1)
    valid = (d > depth_min) & (d <= depth_limit)
    return pts, valid


def render(points, intrinsics, extrinsics=None, rounding=True):
    """Project 3D points to pixel coords.

    Args:
      points: [N, 3]; extrinsics: optional [4, 4] world->cam.

    Returns:
      pixels [N, 2] (v, u), depth [N], in_front [N] bool.
    """
    if extrinsics is not None:
        points = points @ extrinsics[:3, :3].T + extrinsics[:3, 3]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z = points[:, 2]
    in_front = z > 1e-6
    zs = jnp.where(in_front, z, 1.0)
    u = points[:, 0] / zs * fx + cx
    v = points[:, 1] / zs * fy + cy
    if rounding:
        u = jnp.round(u)
        v = jnp.round(v)
    return jnp.stack([v, u], axis=-1), z, in_front


def patchify(height, width, stride):
    """Fold an HxW grid into (H/stride * W/stride) patches of pixel indices.

    Equivalent of the reference 2d3d ``patchify`` (experiments utils.py:
    28-55): patch (i, j) contains the flat indices of its stride x stride
    pixel block. Returns [P, stride*stride] int32 flat pixel indices and the
    patch-center pixel coords [P, 2] (v, u).
    """
    hp, wp = height // stride, width // stride
    pi = jnp.arange(hp) * stride
    pj = jnp.arange(wp) * stride
    dv = jnp.arange(stride)
    du = jnp.arange(stride)
    v = pi[:, None, None, None] + dv[None, None, :, None]   # [hp,1,s,1]
    u = pj[None, :, None, None] + du[None, None, None, :]   # [1,wp,1,s]
    flat = (v * width + u).reshape(hp * wp, stride * stride)
    centers_v = pi[:, None] + (stride - 1) / 2.0
    centers_u = pj[None, :] + (stride - 1) / 2.0
    centers = jnp.stack(
        [jnp.broadcast_to(centers_v, (hp, wp)),
         jnp.broadcast_to(centers_u, (hp, wp))], axis=-1).reshape(-1, 2)
    return flat.astype(jnp.int32), centers


def pairwise_distance(a, b, squared=True):
    """[..., N, C] x [..., M, C] -> [..., N, M] (squared) euclidean distance."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    d2 = a2 - 2.0 * jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                               precision=jax.lax.Precision.HIGHEST) \
        + jnp.swapaxes(b2, -1, -2)
    d2 = jnp.clip(d2, 0.0, None)
    return d2 if squared else jnp.sqrt(d2)


def pairwise_cosine_similarity(a, b, eps=1e-8):
    an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), eps, None)
    bn = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), eps, None)
    return jnp.matmul(an, jnp.swapaxes(bn, -1, -2), precision=jax.lax.Precision.HIGHEST)
