"""SO(3) conversions and helpers (vision3d/ops/so3.py twins).

Scalar-first quaternions throughout (the reference convention,
so3.py:183-205). ``quaternion_to_matrix`` / ``matrix_to_quaternion`` live in
geometry.procrustes / eval.metrics; this module adds the remaining library
surface: skew matrices, Rodrigues exp/log maps, vector-alignment rotations,
and quaternion algebra. All functions are batched, jittable, and avoid
data-dependent control flow (the reference's degenerate-case Python loops
become masked selects, so3.py:160-178).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.features import safe_divide
from .procrustes import quaternion_to_matrix


def skew_symmetric_matrix(vector):
    """[v]_x (so3.py:78-104): [*, 3] -> [*, 3, 3]."""
    x, y, z = vector[..., 0], vector[..., 1], vector[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(vector.shape[:-1] + (3, 3))


def rodrigues_rotation_formula(omega, theta):
    """R = I + sin(t) K + (1 - cos(t)) K^2 (so3.py:107-133).

    omega [*, 3] unit axes, theta [*] angles (rad)."""
    k = skew_symmetric_matrix(omega)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + s * k + (1.0 - c) * (k @ k)


def axis_angle_to_rotation_matrix(phi):
    """so(3) exp map (so3.py:389-407); phi = theta * axis, zero -> identity."""
    theta = jnp.linalg.norm(phi, axis=-1)
    omega = safe_divide(phi, theta[..., None])
    return rodrigues_rotation_formula(omega, theta)


def axis_angle_to_quaternion(phi):
    """so3.py:372-386."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    omega = safe_divide(phi, theta)
    return jnp.concatenate(
        [jnp.cos(0.5 * theta), omega * jnp.sin(0.5 * theta)], axis=-1)


def quaternion_to_axis_angle(q):
    """so3.py:348-369; angle forced into [0, pi] (axis flips if needed)."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    cos_half = q[..., :1]
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    theta = 2.0 * jnp.where(cos_half < 0.0,
                            jnp.arctan2(-sin_half, -cos_half),
                            jnp.arctan2(sin_half, cos_half))
    omega = safe_divide(q[..., 1:], sin_half)
    return omega * theta


def rotation_matrix_to_axis_angle(rotation):
    """SO(3) log map via the quaternion (so3.py:409-426)."""
    from ..eval.metrics import matrix_to_quaternion

    return quaternion_to_axis_angle(matrix_to_quaternion(rotation))


def alignment_rotation_matrix(src_vector, tgt_vector, eps: float = 1e-5):
    """Rotation aligning src to tgt via Rodrigues (so3.py:136-180).

    Degenerate antiparallel pairs (cross product ~0, dot < 0) rotate by pi
    about an axis orthogonal to src, tried from the two reference auxiliary
    axes — as masked selects instead of the reference's data-dependent loop.
    """
    s = src_vector / jnp.clip(jnp.linalg.norm(src_vector, axis=-1, keepdims=True), eps, None)
    t = tgt_vector / jnp.clip(jnp.linalg.norm(tgt_vector, axis=-1, keepdims=True), eps, None)
    skew = skew_symmetric_matrix(s)
    phi = (skew @ t[..., None])[..., 0]                    # sin(theta) * axis
    opposite = jnp.sum(s * t, axis=-1) < 0.0

    def aux_phi(i):
        aux = jnp.zeros_like(t).at[..., i].set(1.0)
        p = (skew @ aux[..., None])[..., 0]
        n = jnp.clip(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12, None)
        return p / n * math.pi, n[..., 0]

    p0, n0 = aux_phi(0)
    p1, _ = aux_phi(1)
    fallback = jnp.where((n0 > eps)[..., None], p0, p1)
    degenerate = (jnp.linalg.norm(phi, axis=-1) < eps) & opposite
    phi = jnp.where(degenerate[..., None], fallback, phi)

    # non-degenerate: |phi| = sin(theta); recover theta from sin & cos
    sin_theta = jnp.linalg.norm(phi, axis=-1)
    cos_theta = jnp.sum(s * t, axis=-1)
    theta = jnp.arctan2(sin_theta, cos_theta)
    theta = jnp.where(degenerate, math.pi, theta)
    omega = safe_divide(phi, sin_theta[..., None])
    return rodrigues_rotation_formula(omega, theta)


def quaternion_product(x, y):
    """Hamilton product, scalar-first (so3.py:183-205)."""
    xw, xx, xy, xz = jnp.split(x, 4, axis=-1)
    yw, yx, yy, yz = jnp.split(y, 4, axis=-1)
    return jnp.concatenate([
        xw * yw - xx * yx - xy * yy - xz * yz,
        xx * yw + xw * yx + xy * yz - xz * yy,
        xy * yw + xw * yy + xz * yx - xx * yz,
        xz * yw + xw * yz + xx * yy - xy * yx,
    ], axis=-1)


def quaternion_conjugate(q):
    """so3.py:208-221."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quaternion_rotate(q, x):
    """y = q * x * q^-1 over pure quaternions (so3.py:224-246)."""
    xq = jnp.concatenate([jnp.zeros_like(x[..., :1]), x], axis=-1)
    yq = quaternion_product(quaternion_product(q, xq), quaternion_conjugate(q))
    return yq[..., 1:]


def apply_rotation(points, rotation):
    """R @ p over [*, N, 3] (so3.py:11-75 non-transposed batch path)."""
    return points @ jnp.swapaxes(rotation, -1, -2)
