"""EPro-PnP: probabilistic PnP with a differentiable LM solver (jittable twin).

Twins the reference's EPro-PnP library (Diff-Reg-2d3d/ops/pnp/ — epropnp.py,
levenberg_marquardt.py, camera.py, cost_fun.py, common.py, distributions.py),
which is dead code on the reference's live configs but part of its shipped
surface. Re-designed for XLA:

  * the trust-region LM loop (levenberg_marquardt.py:162-241) keeps per-object
    boolean accept/reject state; torch's in-place masked writes become a
    ``lax.scan`` over a functional state with ``jnp.where`` masks;
  * ``torch.multinomial`` without replacement (levenberg_marquardt.py:306-308)
    becomes the exact Gumbel-top-k equivalent (Plackett-Luce sampling);
  * the AMIS Monte-Carlo loop (epropnp.py:142-179) is unrolled over its
    (small, static) ``num_iter`` with the same triangular proposal-mixture
    log-prob bookkeeping;
  * pyro's ``MultivariateStudentT`` / the reference's ``VonMisesUniformMix``
    and ``AngularCentralGaussian`` (distributions.py) are re-implemented as
    pure sample/log_prob functions (von Mises sampling via the Best-Fisher
    rejection sampler inside a ``lax.while_loop``);
  * ``cholesky_wrapper``'s try/except CPU fallback (epropnp.py:16-33) becomes
    a NaN-detecting ``safe_cholesky`` (XLA returns NaN where torch raises).

Conventions match the reference: pose is ``[x, y, z, yaw]`` (4 DoF) or
``[x, y, z, w, i, j, k]`` (6 DoF, scalar-first unit quaternion); ``x2d``
weights ``w2d`` are per-axis; the camera is a pinhole ``cam_mats`` [*, 3, 3].
All functions are batch-first, static-shape, and jit/vmap/grad-safe.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .so3 import quaternion_to_matrix, skew_symmetric_matrix

# ---------------------------------------------------------------------------
# rotation parameterizations (common.py:8-64)
# ---------------------------------------------------------------------------


def yaw_to_rot_mat(yaw):
    """Rotation about +Y by ``yaw`` radians (common.py:45-64). [...] -> [..., 3, 3]."""
    s, c = jnp.sin(yaw), jnp.cos(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    rows = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=-1)
    return rows.reshape(yaw.shape + (3, 3))


def _pose_to_rot(pose):
    """pose [..., 4 or 7] -> rotation [..., 3, 3] (dispatch on static dim)."""
    if pose.shape[-1] == 4:
        return yaw_to_rot_mat(pose[..., 3])
    return quaternion_to_matrix(pose[..., 3:])


def get_quaternion_transform_mat(quaternions):
    """Tangent-space delta (3) -> quaternion-embedding delta (4) map.

    camera.py:145-165 (note the reference's spelling 'transfrom'). [..., 4]
    -> [..., 4, 3].
    """
    w, i, j, k = (quaternions[..., n] for n in range(4))
    rows = jnp.stack(
        [i, j, k,
         -w, -k, j,
         k, -w, -i,
         -j, i, -w], axis=-1)
    return rows.reshape(quaternions.shape[:-1] + (4, 3))


# ---------------------------------------------------------------------------
# camera (camera.py)
# ---------------------------------------------------------------------------


class PerspectiveCamera(NamedTuple):
    """Pinhole camera batch (camera.py:33-62); ``lb``/``ub`` are optional
    [..., 2] pixel bounds (both-or-neither, a static choice)."""
    cam_mats: jnp.ndarray            # [*, 3, 3]
    z_min: float = 0.1
    lb: Optional[jnp.ndarray] = None
    ub: Optional[jnp.ndarray] = None

    @staticmethod
    def from_img_shape(cam_mats, img_shape, allowed_border=200):
        """camera.py:55-59: bounds from an [h, w] image shape."""
        lb = jnp.full(img_shape.shape[:-1] + (2,), -0.5 - allowed_border,
                      cam_mats.dtype)
        ub = img_shape[..., ::-1] + (-0.5 + allowed_border)
        return PerspectiveCamera(cam_mats, lb=lb, ub=ub)


def camera_project(x3d, pose, camera: PerspectiveCamera, with_jac: bool,
                   clip_jac: bool = True):
    """Project + (optionally) the pose-tangent Jacobian (camera.py:64-143).

    x3d [*, n, 3], pose [*, 4 or 7] -> x2d_proj [*, n, 2] and jac
    [*, n, 2, dof] (dof = 4 or 6) or None.
    """
    dof = 4 if pose.shape[-1] == 4 else 6
    rot = _pose_to_rot(pose)
    x3d_rot = jnp.einsum("...ni,...ji->...nj", x3d, rot)
    x2dh = jnp.einsum("...ni,...ji->...nj",
                      x3d_rot + pose[..., None, :3], camera.cam_mats)
    zcam = jnp.maximum(x2dh[..., 2:3], camera.z_min)
    x2d_proj = x2dh[..., :2] / zcam

    lb, ub = camera.lb, camera.ub
    if lb is not None and ub is not None:
        x2d_proj = jnp.clip(x2d_proj, lb[..., None, :], ub[..., None, :])

    if not with_jac:
        return x2d_proj, None

    # camera.py:111-143 — analytic d(x2d)/d(tangent pose)
    k2 = camera.cam_mats[..., None, :2, :2]                       # [*, 1, 2, 2]
    d_xy = k2 / zcam[..., None]                                   # [*, n, 2, 2]
    d_z = (camera.cam_mats[..., None, :2, 2:3]
           - x2d_proj[..., None]) / zcam[..., None]               # [*, n, 2, 1]
    if dof == 4:
        d_xzcam_d_yaw = jnp.stack(
            (x3d_rot[..., 2], -x3d_rot[..., 0]), axis=-1)[..., None]
        d_rot = jnp.concatenate([d_xy[..., :1], d_z], axis=-1) @ d_xzcam_d_yaw
    else:
        d_rot = jnp.concatenate([d_xy, d_z], axis=-1) \
            @ skew_symmetric_matrix(x3d_rot * 2)
    jac = jnp.concatenate([d_xy, d_z, d_rot], axis=-1)            # [*, n, 2, dof]

    if clip_jac:
        clip_mask = zcam == camera.z_min
        if lb is not None and ub is not None:
            clip_mask = clip_mask | (x2d_proj == lb[..., None, :]) \
                | (x2d_proj == ub[..., None, :])
        jac = jnp.where(clip_mask[..., None], 0.0, jac)
    return x2d_proj, jac


# ---------------------------------------------------------------------------
# Huber cost (cost_fun.py)
# ---------------------------------------------------------------------------


class HuberPnPCost(NamedTuple):
    """delta is a scalar or [*] per-object tensor (cost_fun.py:23-109)."""
    delta: jnp.ndarray
    eps: float = 1e-10


def adaptive_huber_delta(x2d, w2d, relative_delta=0.5):
    """AdaptiveHuberPnPCost.set_param (cost_fun.py:123-126). Matches torch's
    unbiased variance."""
    x2d_std = jnp.sqrt(jnp.var(x2d, axis=-2, ddof=1).sum(axis=-1))
    return w2d.mean(axis=(-2, -1)) * x2d_std * relative_delta


def evaluate_pnp(x3d, x2d, w2d, pose, camera: PerspectiveCamera,
                 cost_fun: HuberPnPCost, with_jac: bool = False,
                 clip_jac: bool = True):
    """Residual / cost / Jacobian of the robust reprojection objective
    (common.py:67-100 + cost_fun.py:33-89).

    Returns (residual [*, 2n], cost [*], jacobian [*, 2n, dof] or None);
    unused outputs are dead code XLA removes at the call site.
    """
    n = x2d.shape[-2]
    x2d_proj, jac_cam = camera_project(x3d, pose, camera, with_jac, clip_jac)
    delta = jnp.asarray(cost_fun.delta, x2d.dtype)[..., None]     # [*, 1]
    residual = (x2d_proj - x2d) * w2d                             # [*, n, 2]
    s_sqrt = jnp.linalg.norm(residual, axis=-1)                   # [*, n]
    half_rho = jnp.where(s_sqrt <= delta, 0.5 * jnp.square(s_sqrt),
                         delta * s_sqrt - 0.5 * jnp.square(delta))
    cost = half_rho.sum(axis=-1)
    # robust rescaling (cost_fun.py:63-84)
    rho_d_sqrt = jnp.sqrt(
        jnp.minimum(delta / jnp.maximum(s_sqrt, cost_fun.eps), 1.0))
    residual = (residual * rho_d_sqrt[..., None]).reshape(
        residual.shape[:-2] + (n * 2,))
    jacobian = None
    if with_jac:
        jacobian = (jac_cam * (w2d * rho_d_sqrt[..., None])[..., None]
                    ).reshape(jac_cam.shape[:-3] + (n * 2, jac_cam.shape[-1]))
    return residual, cost, jacobian


# ---------------------------------------------------------------------------
# normalization helpers (common.py:103-136)
# ---------------------------------------------------------------------------


def pnp_normalize(x3d, pose=None, detach_transformation=True):
    offset = jnp.mean(
        jax.lax.stop_gradient(x3d) if detach_transformation else x3d, axis=-2)
    x3d_norm = x3d - offset[..., None, :]
    pose_norm = None
    if pose is not None:
        t = pose[..., :3] + jnp.einsum(
            "...ij,...j->...i", _pose_to_rot(pose), offset)
        pose_norm = jnp.concatenate([t, pose[..., 3:]], axis=-1)
    return offset, x3d_norm, pose_norm


def pnp_denormalize(offset, pose_norm):
    t = pose_norm[..., :3] - jnp.einsum(
        "...ij,...j->...i", _pose_to_rot(pose_norm), offset)
    return jnp.concatenate([t, pose_norm[..., 3:]], axis=-1)


# ---------------------------------------------------------------------------
# LM solver (levenberg_marquardt.py)
# ---------------------------------------------------------------------------


class LMConfig(NamedTuple):
    """Solver constants (levenberg_marquardt.py:31-53)."""
    dof: int = 4
    num_iter: int = 10
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32
    min_relative_decrease: float = 1e-3
    initial_trust_region_radius: float = 30.0
    max_trust_region_radius: float = 1e16
    eps: float = 1e-5


def pose_add(pose, step, dof: int):
    """Apply a tangent-space step (levenberg_marquardt.py:255-265)."""
    if dof == 4:
        return pose + step
    q = pose[..., 3:] + jnp.einsum(
        "...ij,...j->...i", get_quaternion_transform_mat(pose[..., 3:]),
        step[..., 3:])
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([pose[..., :3] + step[..., :3], q], axis=-1)


def gn_step(x3d, x2d, w2d, pose, camera, cost_fun, dof: int, eps=1e-5):
    """One differentiable Gauss-Newton step (levenberg_marquardt.py:243-253).

    This is the step that makes the solver end-to-end differentiable: the LM
    solve itself runs under stop_gradient, then `pose_add(pose, gn_step(...))`
    backpropagates through one linearized solve.
    """
    residual, _, jac = evaluate_pnp(
        x3d, x2d, w2d, pose, camera, cost_fun, with_jac=True)
    jtj = jnp.einsum("...ni,...nj->...ij", jac, jac) \
        + jnp.eye(dof, dtype=jac.dtype) * eps
    gradient = jnp.einsum("...ni,...n->...i", jac, residual)
    return -jnp.linalg.solve(jtj, gradient[..., None])[..., 0]


def _lm_trust_region(x3d, x2d, w2d, camera, cost_fun, pose0, cfg: LMConfig):
    """Fixed-iteration trust-region core (levenberg_marquardt.py:153-241).

    torch mutates (pose, jac, residual, cost, radius, decrease_factor,
    step_is_successful) in place with boolean masks; here the same septuple
    (plus the candidate jac/res/cost) is a scan carry updated via jnp.where.
    """
    def eval_fn(pose):
        return evaluate_pnp(x3d, x2d, w2d, pose, camera, cost_fun,
                            with_jac=True, clip_jac=True)

    res0, c0, jac0 = eval_fn(pose0)
    batch = pose0.shape[:-1]
    radius0 = jnp.full(batch, cfg.initial_trust_region_radius, pose0.dtype)
    dfac0 = jnp.full(batch, 2.0, pose0.dtype)
    ok0 = jnp.zeros(batch, bool)

    def body(carry, _):
        pose, jac, res, c, jac_n, res_n, c_n, ok, radius, dfac = carry
        # adopt last iteration's accepted candidate (lm:199-201)
        m = ok[..., None]
        jac = jnp.where(m[..., None], jac_n, jac)
        res = jnp.where(m, res_n, res)
        c = jnp.where(ok, c_n, c)

        jtj = jnp.einsum("...ni,...nj->...ij", jac, jac)
        diag = jnp.diagonal(jtj, axis1=-2, axis2=-1)
        lm_add = jnp.clip(diag, cfg.min_lm_diagonal,
                          cfg.max_lm_diagonal) / radius[..., None] + cfg.eps
        jtj_lm = jtj + jnp.eye(cfg.dof, dtype=jtj.dtype) * lm_add[..., None, :]
        gradient = jnp.einsum("...ni,...n->...i", jac, res)
        step = -jnp.linalg.solve(jtj_lm, gradient[..., None])[..., 0]

        pose_new = pose_add(pose, step, cfg.dof)
        res_n, c_n, jac_n = eval_fn(pose_new)

        # model cost change + acceptance (lm:225-229)
        mcc = -jnp.einsum(
            "...i,...i->...", step,
            jnp.einsum("...ij,...j->...i", jtj, step) / 2 + gradient)
        rd = (c - c_n) / mcc
        ok = (rd >= cfg.min_relative_decrease) & (mcc > 0.0)

        pose = jnp.where(ok[..., None], pose_new, pose)
        # trust-region radius bookkeeping, reference order (lm:233-240):
        # shrink-factor update for accepted, THEN a global clamp, THEN the
        # rejected division (so a rejected radius can dip below eps)
        grow = jnp.clip(1.0 - (2.0 * rd - 1.0) ** 3, 1.0 / 3.0, None)
        radius = jnp.where(ok, radius / grow, radius)
        radius = jnp.clip(radius, cfg.eps, cfg.max_trust_region_radius)
        radius = jnp.where(ok, radius, radius / dfac)
        dfac = jnp.where(ok, 2.0, dfac * 2.0)
        return (pose, jac, res, c, jac_n, res_n, c_n, ok, radius, dfac), None

    carry0 = (pose0, jac0, res0, c0, jac0, res0, c0, ok0, radius0, dfac0)
    (pose, jac, res, c, jac_n, res_n, c_n, ok, _, _), _ = jax.lax.scan(
        body, carry0, None, length=cfg.num_iter)

    # final adoption for cov/cost outputs (lm:170-176)
    jac = jnp.where(ok[..., None, None], jac_n, jac)
    c = jnp.where(ok, c_n, c)
    jtj = jnp.einsum("...ni,...nj->...ij", jac, jac) \
        + jnp.eye(cfg.dof, dtype=jac.dtype) * cfg.eps
    return pose, jtj, c


def _lm_fast(x3d, x2d, w2d, camera, cost_fun, pose0, cfg: LMConfig):
    """fast_mode: plain Gauss-Newton, no trust region, unclipped Jacobian
    (levenberg_marquardt.py:136-152)."""
    def body(carry, _):
        pose, _, _ = carry
        res, c, jac = evaluate_pnp(x3d, x2d, w2d, pose, camera, cost_fun,
                                   with_jac=True, clip_jac=False)
        jtj = jnp.einsum("...ni,...nj->...ij", jac, jac) \
            + jnp.eye(cfg.dof, dtype=jac.dtype) * cfg.eps
        gradient = jnp.einsum("...ni,...n->...i", jac, res)
        step = -jnp.linalg.solve(jtj, gradient[..., None])[..., 0]
        pose = pose + step if cfg.dof == 4 else pose_add(pose, step, 6)
        # the reference's loop-leftover jtj/cost (evaluated at the PRE-update
        # pose of this iteration) are what its with_pose_cov/with_cost return
        # (levenberg_marquardt.py:136-183) — keep them in the carry
        return (pose, jtj, c), None

    batch = pose0.shape[:-1]
    carry0 = (pose0,
              jnp.zeros(batch + (cfg.dof, cfg.dof), pose0.dtype),
              jnp.zeros(batch, pose0.dtype))
    (pose, jtj, c), _ = jax.lax.scan(body, carry0, None, length=cfg.num_iter)
    return pose, jtj, c


def lm_solve(x3d, x2d, w2d, camera, cost_fun, pose_init, cfg: LMConfig,
             fast_mode: bool = False):
    """LMSolver.solve with a given initialization (levenberg_marquardt.py:80-190).

    Returns (pose_opt [*, 4 or 7], pose_cov [*, dof, dof], cost [*]); the
    whole solve runs under stop_gradient like torch's no_grad (lm:104) — use
    ``gn_step``/``pose_add`` for the differentiable pose_opt_plus.
    """
    core = _lm_fast if fast_mode else _lm_trust_region
    sg = jax.lax.stop_gradient
    camera_sg = camera._replace(
        cam_mats=sg(camera.cam_mats),
        lb=None if camera.lb is None else sg(camera.lb),
        ub=None if camera.ub is None else sg(camera.ub))
    cost_sg = cost_fun._replace(delta=sg(jnp.asarray(cost_fun.delta)))
    pose, jtj, cost = core(sg(x3d), sg(x2d), sg(w2d), camera_sg, cost_sg,
                           sg(pose_init), cfg)
    return sg(pose), jnp.linalg.inv(sg(jtj)), sg(cost)


class RSLMConfig(NamedTuple):
    """Random-sample LM initializer (levenberg_marquardt.py:268-282)."""
    num_points: int = 16
    num_proposals: int = 64
    lm: LMConfig = LMConfig(num_iter=3)


def center_based_init(x2d, x3d, camera, dof: int, eps=1e-6):
    """Scale-matching translation init (levenberg_marquardt.py:283-298)."""
    x2dh = jnp.concatenate([x2d, jnp.ones_like(x2d[..., :1])], axis=-1)
    x2dc = jnp.swapaxes(
        jnp.linalg.solve(camera.cam_mats, jnp.swapaxes(x2dh, -1, -2)), -1, -2)
    x2dc = x2dc[..., :2] / jnp.maximum(x2dc[..., 2:], eps)
    x2dc_mean = x2dc.mean(axis=-2)
    x2dc_std = jnp.std(x2dc, axis=-2, ddof=1)                     # torch std
    x3d_std = jnp.std(x3d, axis=-2, ddof=1)
    mh = jnp.concatenate([x2dc_mean, jnp.ones_like(x2dc_mean[..., :1])],
                         axis=-1)
    if dof == 4:
        scale = x3d_std[..., 1] / jnp.maximum(x2dc_std[..., 1], eps)
    else:
        scale = math.sqrt(2 / 3) * jnp.linalg.norm(x3d_std, axis=-1) \
            / jnp.maximum(jnp.linalg.norm(x2dc_std, axis=-1), eps)
    return mh * scale[..., None]


def rslm_solve(key, x3d, x2d, w2d, camera, cost_fun, cfg: RSLMConfig,
               dof: int, fast_mode: bool = False, eps=1e-5):
    """RSLMSolver.solve: RANSAC-style best-of-``num_proposals`` LM from random
    minimal-ish subsets (levenberg_marquardt.py:300-353).

    Returns (pose [B, 4 or 7], min_cost [B]).
    """
    bs, pn, _ = x2d.shape
    P, S = cfg.num_proposals, cfg.num_points
    k_inds, k_rot = jax.random.split(key)

    # torch.multinomial(mean_weight, S) without replacement == Gumbel top-k
    mean_w = jnp.broadcast_to(w2d.mean(axis=-1), (P, bs, pn))
    gumbel = jax.random.gumbel(k_inds, (P, bs, pn), x2d.dtype)
    _, inds = jax.lax.top_k(jnp.log(jnp.maximum(mean_w, 1e-30)) + gumbel, S)

    x2d_s = jnp.take_along_axis(x2d[None], inds[..., None], axis=-2)
    x3d_s = jnp.take_along_axis(x3d[None], inds[..., None], axis=-2)
    w2d_s = jnp.take_along_axis(w2d[None], inds[..., None], axis=-2)

    t_init = jnp.broadcast_to(
        center_based_init(x2d, x3d, camera, dof), (P, bs, 3))
    if dof == 4:
        yaw = jax.random.uniform(k_rot, (P, bs, 1), x2d.dtype) * (2 * math.pi)
        pose_init = jnp.concatenate([t_init, yaw], axis=-1)
    else:
        q = jax.random.normal(k_rot, (P, bs, 4), x2d.dtype)
        q_norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = jnp.where(q_norm < eps, jnp.array([1.0, 0, 0, 0], x2d.dtype),
                      q / jnp.maximum(q_norm, eps))
        pose_init = jnp.concatenate([t_init, q], axis=-1)

    cam_p = camera._replace(
        cam_mats=jnp.broadcast_to(camera.cam_mats, (P, bs, 3, 3)),
        lb=None if camera.lb is None else jnp.broadcast_to(
            camera.lb, (P, bs, 2)),
        ub=None if camera.ub is None else jnp.broadcast_to(
            camera.ub, (P, bs, 2)))
    cost_p = cost_fun._replace(
        delta=jnp.broadcast_to(jnp.asarray(cost_fun.delta), (P, bs)))

    pose, _, _ = lm_solve(x3d_s, x2d_s, w2d_s, cam_p, cost_p, pose_init,
                          cfg.lm._replace(dof=dof), fast_mode=fast_mode)
    # score every proposal on the FULL set, keep the best (lm:344-347)
    _, cost_all, _ = evaluate_pnp(x3d[None], x2d[None], w2d[None], pose,
                                  camera, cost_fun)
    best = jnp.argmin(cost_all, axis=0)
    pose = jnp.take_along_axis(pose, best[None, :, None], axis=0)[0]
    return pose, jnp.min(cost_all, axis=0)


def lm_solver(x3d, x2d, w2d, camera, cost_fun, cfg: LMConfig,
              rs_cfg: Optional[RSLMConfig] = None, key=None, pose_init=None,
              cost_init=None, force_init_solve: bool = False,
              with_pose_opt_plus: bool = False, fast_mode: bool = False,
              normalize: bool = False):
    """LMSolver.forward + init-solver arbitration (levenberg_marquardt.py:55-130).

    When ``pose_init`` is None (or ``force_init_solve``), runs the RSLM
    initializer; when both exist, keeps whichever has lower cost per object.
    Returns (pose_opt, pose_cov, cost, pose_opt_plus).
    """
    transform = None
    if normalize:
        transform, x3d, pose_init = pnp_normalize(x3d, pose_init)

    if pose_init is None or force_init_solve:
        assert rs_cfg is not None and key is not None, \
            "init solver required when pose_init is None or force_init_solve"
        if pose_init is None:
            pose0, _ = rslm_solve(key, x3d, x2d, w2d, camera, cost_fun,
                                  rs_cfg, cfg.dof, fast_mode=fast_mode)
        else:
            if cost_init is None:
                _, cost_init, _ = evaluate_pnp(
                    x3d, x2d, w2d, pose_init, camera, cost_fun)
            pose_solve, cost_solve = rslm_solve(
                key, x3d, x2d, w2d, camera, cost_fun, rs_cfg, cfg.dof,
                fast_mode=fast_mode)
            use_init = (cost_init < cost_solve)[..., None]
            pose0 = jnp.where(use_init, pose_init, pose_solve)
    else:
        pose0 = pose_init

    pose_opt, pose_cov, cost = lm_solve(
        x3d, x2d, w2d, camera, cost_fun, pose0, cfg, fast_mode=fast_mode)

    pose_opt_plus = None
    if with_pose_opt_plus:
        step = gn_step(x3d, x2d, w2d, pose_opt, camera, cost_fun, cfg.dof,
                       cfg.eps)
        pose_opt_plus = pose_add(pose_opt, step, cfg.dof)

    if normalize:
        pose_opt = pnp_denormalize(transform, pose_opt)
        if pose_opt_plus is not None:
            pose_opt_plus = pnp_denormalize(transform, pose_opt_plus)
    return pose_opt, pose_cov, cost, pose_opt_plus


# ---------------------------------------------------------------------------
# proposal distributions (distributions.py + pyro's MultivariateStudentT)
# ---------------------------------------------------------------------------


def safe_cholesky(mat, default_diag=None):
    """cholesky_wrapper (epropnp.py:16-33): where the factorization fails
    (NaN under XLA, RuntimeError under torch), substitute a default tril."""
    n = mat.shape[-1]
    tril = jnp.linalg.cholesky(mat)
    if default_diag is not None:
        default = jnp.diag(jnp.asarray(default_diag, mat.dtype))
    else:
        default = jnp.eye(n, dtype=mat.dtype)
    bad = jnp.isnan(tril).any(axis=(-2, -1), keepdims=True)
    return jnp.where(bad, default, tril)


def _mahalanobis_sq(scale_tril, x):
    """||L^-1 x||^2 with batched lower-triangular L (broadcasts batch dims —
    triangular_solve itself requires equal batch ranks)."""
    n = x.shape[-1]
    batch = jnp.broadcast_shapes(scale_tril.shape[:-2], x.shape[:-1])
    tril = jnp.broadcast_to(scale_tril, batch + (n, n))
    xb = jnp.broadcast_to(x, batch + (n,))
    y = jax.scipy.linalg.solve_triangular(tril, xb[..., None],
                                          lower=True)[..., 0]
    return jnp.sum(jnp.square(y), axis=-1)


def mvt_log_prob(x, loc, scale_tril, df: float = 3.0):
    """Multivariate Student-t log-density (pyro MultivariateStudentT twin)."""
    p = x.shape[-1]
    m = _mahalanobis_sq(scale_tril, x - loc)
    half_log_det = jnp.log(
        jnp.diagonal(scale_tril, axis1=-2, axis2=-1)).sum(-1)
    return (math.lgamma((df + p) / 2) - math.lgamma(df / 2)
            - 0.5 * p * math.log(df * math.pi) - half_log_det
            - 0.5 * (df + p) * jnp.log1p(m / df))


def mvt_sample(key, loc, scale_tril, sample_shape: Tuple[int, ...],
               df: float = 3.0):
    """x = loc + (L z) sqrt(df / chi2_df)."""
    kz, kg = jax.random.split(key)
    shape = sample_shape + loc.shape
    z = jax.random.normal(kz, shape, loc.dtype)
    chi2 = 2.0 * jax.random.gamma(kg, df / 2.0, shape[:-1], loc.dtype)
    scaled = jnp.einsum("...ij,...j->...i", scale_tril, z)
    return loc + scaled * jnp.sqrt(df / chi2)[..., None]


def von_mises_log_prob(x, loc, kappa):
    """VM(loc, kappa) log-density via the exponentially-scaled Bessel I0."""
    return kappa * jnp.cos(x - loc) - math.log(2 * math.pi) \
        - (jnp.log(jax.scipy.special.i0e(kappa)) + kappa)


def von_mises_sample(key, loc, kappa, sample_shape: Tuple[int, ...]):
    """Best-Fisher (1979) rejection sampler, vectorized in a while_loop.

    Twin of np.random.vonmises (distributions.py:69-71); tiny kappa falls
    back to the (correct in the limit) uniform draw.
    """
    shape = sample_shape + loc.shape
    kappa_s = jnp.maximum(jnp.broadcast_to(kappa, shape), 1e-7)
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa_s * kappa_s)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa_s)
    r = (1.0 + rho * rho) / (2.0 * rho)

    def cond(state):
        _, done, _ = state
        return ~jnp.all(done)

    def body(state):
        k, done, theta = state
        k, k1, k2, k3 = jax.random.split(k, 4)
        u1 = jax.random.uniform(k1, shape, loc.dtype)
        u2 = jax.random.uniform(k2, shape, loc.dtype)
        u3 = jax.random.uniform(k3, shape, loc.dtype)
        z = jnp.cos(math.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa_s * (r - f)
        accept = (c * (2.0 - c) - u2 > 0.0) \
            | (jnp.log(jnp.maximum(c, 1e-30) / u2) + 1.0 - c >= 0.0)
        new_theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        theta = jnp.where(done, theta, jnp.where(accept, new_theta, theta))
        return k, done | accept, theta

    _, _, theta = jax.lax.while_loop(
        cond, body, (key, jnp.zeros(shape, bool), jnp.zeros(shape, loc.dtype)))
    sample = theta + loc
    # tiny-kappa limit: VM -> uniform on the circle
    uni = jax.random.uniform(jax.random.fold_in(key, 1), shape, loc.dtype,
                             -math.pi, math.pi)
    return jnp.where(jnp.broadcast_to(kappa, shape) < 1e-6, uni, sample)


def vm_uniform_mix_log_prob(x, loc, kappa, uniform_mix=0.25):
    """VonMisesUniformMix.log_prob (distributions.py:74-79)."""
    vm = von_mises_log_prob(x, loc, kappa) + math.log(1 - uniform_mix)
    return jnp.logaddexp(
        vm, jnp.full_like(vm, math.log(uniform_mix / (2 * math.pi))))


def vm_uniform_mix_sample(key, loc, kappa, n_samples: int, uniform_mix=0.25):
    """VonMisesUniformMix.sample (distributions.py:61-72): the FIRST
    round(n*mix) samples along axis 0 are uniform, the rest von Mises —
    the reference's deterministic split, kept for parity."""
    n_uni = round(n_samples * uniform_mix)
    ku, kv = jax.random.split(key)
    uni = jax.random.uniform(ku, (n_uni,) + loc.shape, loc.dtype,
                             -math.pi, math.pi)
    vm = von_mises_sample(kv, loc, kappa, (n_samples - n_uni,))
    return jnp.concatenate([uni, vm], axis=0)


def acg_log_prob(x, scale_tril, eps=1e-6):
    """AngularCentralGaussian.log_prob (distributions.py:32-40)."""
    q = x.shape[-1]
    area = 2 * math.pi ** (0.5 * q) / math.gamma(0.5 * q)
    m = _mahalanobis_sq(scale_tril, x)
    half_log_det = jnp.log(
        jnp.diagonal(scale_tril, axis1=-2, axis2=-1)).sum(-1)
    return jnp.log(m) * (-q / 2) - half_log_det - math.log(area)


def acg_sample(key, scale_tril, sample_shape: Tuple[int, ...], eps=1e-6):
    """AngularCentralGaussian.rsample (distributions.py:42-52)."""
    q = scale_tril.shape[-1]
    shape = sample_shape + scale_tril.shape[:-2] + (q,)
    z = jax.random.normal(key, shape, scale_tril.dtype)
    g = jnp.einsum("...ij,...j->...i", scale_tril, z)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    pole = jnp.zeros(q, scale_tril.dtype).at[0].set(1.0)
    return jnp.where(norm < eps, pole, g / jnp.maximum(norm, eps))


# ---------------------------------------------------------------------------
# EPro-PnP Monte Carlo forward (epropnp.py)
# ---------------------------------------------------------------------------


class EProPnP4DoF(NamedTuple):
    """AMIS config, 4 DoF (epropnp.py:199-260): Student-t position proposal +
    von Mises/uniform mixture yaw proposal."""
    mc_samples: int = 512
    num_iter: int = 4
    eps: float = 1e-5

    @property
    def iter_samples(self):
        assert self.mc_samples % self.num_iter == 0
        return self.mc_samples // self.num_iter

    def initial_fit(self, pose_opt, pose_cov, camera):
        trans_mode = pose_opt[..., :3]
        trans_tril = safe_cholesky(pose_cov[..., :3, :3], [1.0, 1.0, 4.0])
        rot_mode = pose_opt[..., 3:]
        rot_kappa = 0.33 / jnp.maximum(pose_cov[..., 3:, 3], self.eps)
        return trans_mode, trans_tril, rot_mode, rot_kappa

    def sample(self, key, params, n):
        trans_mode, trans_tril, rot_mode, rot_kappa = params
        kt, kr = jax.random.split(key)
        t = mvt_sample(kt, trans_mode, trans_tril, (n,))
        yaw = vm_uniform_mix_sample(kr, rot_mode[..., 0], rot_kappa[..., 0], n)
        return jnp.concatenate([t, yaw[..., None]], axis=-1)

    def log_prob(self, params, pose):
        trans_mode, trans_tril, rot_mode, rot_kappa = params
        return mvt_log_prob(pose[..., :3], trans_mode, trans_tril) \
            + vm_uniform_mix_log_prob(
                pose[..., 3], rot_mode[..., 0], rot_kappa[..., 0])

    def estimate_params(self, samples, logweights, camera):
        """Weighted re-fit of both proposals (epropnp.py:238-260)."""
        w = jax.nn.softmax(logweights, axis=0)                    # [S, B]
        t = samples[..., :3]
        trans_mode = (w[..., None] * t).sum(axis=0)
        dev = t - trans_mode
        trans_cov = jnp.einsum("sb,sbi,sbj->bij", w, dev, dev)
        trans_tril = safe_cholesky(trans_cov, [1.0, 1.0, 4.0])
        sin_m = (w * jnp.sin(samples[..., 3])).sum(axis=0)
        cos_m = (w * jnp.cos(samples[..., 3])).sum(axis=0)
        rot_mode = jnp.arctan2(sin_m, cos_m)[..., None]
        r_sq = (sin_m ** 2 + cos_m ** 2)[..., None]
        rot_kappa = 0.33 * jnp.maximum(jnp.sqrt(r_sq), self.eps) \
            * (2 - r_sq) / jnp.maximum(1 - r_sq, self.eps)
        return trans_mode, trans_tril, rot_mode, rot_kappa


class EProPnP6DoF(NamedTuple):
    """AMIS config, 6 DoF (epropnp.py:263-342): Student-t position proposal +
    angular central Gaussian quaternion proposal."""
    mc_samples: int = 512
    num_iter: int = 4
    eps: float = 1e-5
    acg_mle_iter: int = 3
    acg_dispersion: float = 0.001

    @property
    def iter_samples(self):
        assert self.mc_samples % self.num_iter == 0
        return self.mc_samples // self.num_iter

    def _disperse(self, rot_cov):
        eye4 = jnp.eye(4, dtype=rot_cov.dtype)
        return safe_cholesky(
            rot_cov + jnp.linalg.det(rot_cov)[..., None, None] ** 0.25
            * (self.acg_dispersion * eye4))

    def initial_fit(self, pose_opt, pose_cov, camera):
        trans_mode = pose_opt[..., :3]
        trans_tril = safe_cholesky(pose_cov[..., :3, :3])
        eye4 = jnp.eye(4, dtype=pose_opt.dtype)
        tmat = get_quaternion_transform_mat(pose_opt[..., 3:])
        rot_cov = jnp.linalg.inv(
            tmat @ jnp.linalg.inv(pose_cov[..., 3:, 3:])
            @ jnp.swapaxes(tmat, -1, -2) + eye4)
        rot_cov = rot_cov / jnp.trace(
            rot_cov, axis1=-2, axis2=-1)[..., None, None]
        return trans_mode, trans_tril, self._disperse(rot_cov)

    def sample(self, key, params, n):
        trans_mode, trans_tril, rot_tril = params
        kt, kr = jax.random.split(key)
        t = mvt_sample(kt, trans_mode, trans_tril, (n,))
        q = acg_sample(kr, rot_tril, (n,), self.eps)
        return jnp.concatenate([t, q], axis=-1)

    def log_prob(self, params, pose):
        trans_mode, trans_tril, rot_tril = params
        return mvt_log_prob(pose[..., :3], trans_mode, trans_tril) \
            + acg_log_prob(pose[..., 3:], rot_tril)

    def estimate_params(self, samples, logweights, camera):
        """Weighted Student-t re-fit + fixed-point ACG MLE (epropnp.py:317-342)."""
        w = jax.nn.softmax(logweights, axis=0)                    # [S, B]
        t = samples[..., :3]
        trans_mode = (w[..., None] * t).sum(axis=0)
        dev = t - trans_mode
        trans_cov = jnp.einsum("sb,sbi,sbj->bij", w, dev, dev)
        trans_tril = safe_cholesky(trans_cov)
        eye4 = jnp.eye(4, dtype=samples.dtype)
        rot = samples[..., 3:]                                    # [S, B, 4]
        rrt = rot[..., :, None] * rot[..., None, :]               # [S, B, 4, 4]
        rot_cov = jnp.broadcast_to(eye4, trans_cov.shape[:-2] + (4, 4))
        for _ in range(self.acg_mle_iter):
            m = jnp.einsum("sbi,bij,sbj->sb", rot,
                           jnp.linalg.inv(rot_cov), rot)
            inv_m = w / jnp.maximum(m, self.eps)
            inv_m = inv_m / inv_m.sum(axis=0)
            rot_cov = jnp.einsum("sb,sbij->bij", inv_m, rrt) + eye4 * self.eps
        return trans_mode, trans_tril, self._disperse(rot_cov)


def monte_carlo_forward(key, cfg, x3d, x2d, w2d, camera, cost_fun,
                        lm_cfg: LMConfig, rs_cfg: RSLMConfig,
                        pose_init=None, force_init_solve: bool = True,
                        normalize: bool = False):
    """EProPnPBase.monte_carlo_forward (epropnp.py:87-196): adaptive
    multiple-importance-sampling over the pose posterior.

    ``cfg`` is an EProPnP4DoF or EProPnP6DoF. Returns the reference tuple
    (pose_opt, cost, pose_opt_plus, pose_samples [mc, B, d],
    pose_sample_logweights [mc, B], cost_init). The sample log-weights are
    differentiable w.r.t. (x3d, x2d, w2d) exactly as in torch — the proposal
    parameters are fit under stop_gradient (torch no_grad, epropnp.py:139,
    174), the integrand cost is not.
    """
    transform = None
    if normalize:
        transform, x3d, pose_init = pnp_normalize(x3d, pose_init)

    cost_init = None
    if pose_init is not None:
        _, cost_init, _ = evaluate_pnp(x3d, x2d, w2d, pose_init, camera,
                                       cost_fun)

    k_solve, k_mc = jax.random.split(key)
    pose_opt, pose_cov, cost, pose_opt_plus = lm_solver(
        x3d, x2d, w2d, camera, cost_fun, lm_cfg, rs_cfg, k_solve,
        pose_init=pose_init, cost_init=cost_init,
        force_init_solve=force_init_solve, with_pose_opt_plus=True)

    n_iter, n_s = cfg.num_iter, cfg.iter_samples
    params = [jax.tree.map(jax.lax.stop_gradient,
                           cfg.initial_fit(pose_opt, pose_cov, camera))]
    samples = []                                   # per-iter [n_s, B, d]
    costs = []                                     # per-iter [n_s, B]
    # logp[i][j]: proposal i evaluated on iteration-j samples
    logp = [[None] * n_iter for _ in range(n_iter)]
    logweights = None
    keys = jax.random.split(k_mc, n_iter)

    for i in range(n_iter):
        samples.append(cfg.sample(keys[i], params[i], n_s))
        costs.append(evaluate_pnp(x3d, x2d, w2d, samples[i], camera,
                                  cost_fun)[1])
        for j in range(i + 1):
            logp[i][j] = cfg.log_prob(params[i], samples[j])
        for j in range(i):
            logp[j][i] = cfg.log_prob(params[j], samples[i])
        # mixture over proposals 0..i for samples 0..i (epropnp.py:165-169)
        stacked = jnp.stack(
            [jnp.stack(logp[d][:i + 1], axis=0) for d in range(i + 1)],
            axis=0)                                # [i+1 distr, i+1 iter, n_s, B]
        mix = jax.scipy.special.logsumexp(stacked, axis=0) - math.log(i + 1)
        logweights = -jnp.stack(costs, axis=0) - mix       # [i+1, n_s, B]
        if i == n_iter - 1:
            break
        flat_s = jnp.concatenate(samples, axis=0)
        flat_w = logweights.reshape((-1,) + logweights.shape[2:])
        params.append(jax.tree.map(
            jax.lax.stop_gradient,
            cfg.estimate_params(flat_s, jax.lax.stop_gradient(flat_w),
                                camera)))

    pose_samples = jnp.concatenate(samples, axis=0)        # [mc, B, d]
    pose_sample_logweights = logweights.reshape(
        (cfg.mc_samples,) + logweights.shape[2:])

    if normalize:
        pose_opt = pnp_denormalize(transform, pose_opt)
        pose_samples = pnp_denormalize(transform, pose_samples)
        if pose_opt_plus is not None:
            pose_opt_plus = pnp_denormalize(transform, pose_opt_plus)
    return (pose_opt, cost, pose_opt_plus, pose_samples,
            pose_sample_logweights, cost_init)
