"""EPro-PnP twin vs the reference torch implementation + scipy.

The reference solver stack (Diff-Reg-2d3d/ops/pnp/{common,camera,cost_fun,
levenberg_marquardt}.py) is pure torch and is loaded here file-by-file under
a synthetic package (the sibling epropnp.py/distributions.py need pyro,
which is absent — our AMIS layer is instead validated against scipy
densities and by posterior-recovery behavior).

Reference quirk exercised below: ``solve_wrapper`` does
``torch.linalg.solve(A, b)[0]`` (levenberg_marquardt.py:15-19) — written for
the torch-1.x ``torch.solve`` tuple return. Under torch>=1.9 the ``[0]``
grabs BATCH ELEMENT 0, which is only coincidentally correct at batch size 1.
We therefore check exact parity against the literal reference at B=1 and
against a solve_wrapper-corrected reference at B>1 (the intended semantics,
matching the upstream EPro-PnP repo).
"""
from __future__ import annotations

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffreg_tpu.geometry import epropnp as ep

REF_PNP = "/root/reference/Diff-Reg-2d3d/ops/pnp"


# ---------------------------------------------------------------------------
# reference loading
# ---------------------------------------------------------------------------


def _load_ref_pnp():
    """Load common/camera/cost_fun/levenberg_marquardt as package 'refpnp'."""
    if "refpnp" in sys.modules:
        return sys.modules["refpnp"]
    pkg = types.ModuleType("refpnp")
    pkg.__path__ = [REF_PNP]
    sys.modules["refpnp"] = pkg
    for name in ("common", "camera", "cost_fun", "levenberg_marquardt"):
        spec = importlib.util.spec_from_file_location(
            f"refpnp.{name}", os.path.join(REF_PNP, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpnp.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


@pytest.fixture(scope="module")
def refpnp():
    return _load_ref_pnp()


def _problem(seed, batch, n, dof, noise=0.5):
    """A synthetic pinhole PnP problem with a known pose."""
    rng = np.random.RandomState(seed)
    k = np.array([[480.0, 0, 320], [0, 480.0, 240], [0, 0, 1]], np.float64)
    cam_mats = np.broadcast_to(k, (batch, 3, 3)).copy()
    x3d = rng.uniform(-1, 1, (batch, n, 3))
    t = np.stack([rng.uniform(-0.5, 0.5, batch),
                  rng.uniform(-0.5, 0.5, batch),
                  rng.uniform(4, 6, batch)], 1)
    if dof == 4:
        rot = rng.uniform(-0.5, 0.5, (batch, 1))
    else:
        rot = rng.normal(0, 1, (batch, 4))
        rot[:, 0] += 3.0
        rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    pose = np.concatenate([t, rot], axis=1)
    cam = ep.PerspectiveCamera(jnp.asarray(cam_mats))
    x2d, _ = ep.camera_project(jnp.asarray(x3d), jnp.asarray(pose), cam,
                               with_jac=False)
    x2d = np.asarray(x2d) + rng.normal(0, noise, (batch, n, 2))
    w2d = rng.uniform(0.5, 1.5, (batch, n, 2))
    return cam_mats, x3d, x2d, w2d, pose


def _ref_objects(refpnp, cam_mats, x2d, w2d, lb=None, ub=None):
    import torch

    camera = refpnp.camera.PerspectiveCamera(
        cam_mats=torch.tensor(cam_mats, dtype=torch.float64),
        lb=None if lb is None else torch.tensor(lb, dtype=torch.float64),
        ub=None if ub is None else torch.tensor(ub, dtype=torch.float64))
    cost_fun = refpnp.cost_fun.AdaptiveHuberPnPCost(relative_delta=0.5)
    cost_fun.set_param(torch.tensor(x2d, dtype=torch.float64),
                       torch.tensor(w2d, dtype=torch.float64))
    return camera, cost_fun


def _our_objects(cam_mats, x2d, w2d, lb=None, ub=None):
    camera = ep.PerspectiveCamera(
        jnp.asarray(cam_mats),
        lb=None if lb is None else jnp.asarray(lb),
        ub=None if ub is None else jnp.asarray(ub))
    cost = ep.HuberPnPCost(
        delta=ep.adaptive_huber_delta(jnp.asarray(x2d), jnp.asarray(w2d)))
    return camera, cost


# f64 throughout: these are host-side parity checks, the twin itself is
# dtype-polymorphic
@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# projection / cost parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dof", [4, 6])
def test_evaluate_pnp_parity(refpnp, dof):
    import torch

    cam_mats, x3d, x2d, w2d, pose = _problem(1, 4, 48, dof)
    camera_t, cost_t = _ref_objects(refpnp, cam_mats, x2d, w2d)
    res_t, cost_val_t, jac_t = refpnp.common.evaluate_pnp(
        torch.tensor(x3d), torch.tensor(x2d), torch.tensor(w2d),
        torch.tensor(pose), camera_t, cost_t,
        out_jacobian=True, out_residual=True, out_cost=True)

    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    res_j, cost_val_j, jac_j = ep.evaluate_pnp(
        jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d),
        jnp.asarray(pose), camera_j, cost_j, with_jac=True)

    np.testing.assert_allclose(np.asarray(res_j), res_t.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(cost_val_j), cost_val_t.numpy(),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(jac_j), jac_t.numpy(), atol=1e-10)


def test_project_with_bounds_parity(refpnp):
    """Pixel-bound clamping + the Jacobian clip mask (camera.py:81-105)."""
    import torch

    cam_mats, x3d, x2d, w2d, pose = _problem(2, 3, 32, 6)
    # tight bounds so a good fraction of points actually clip
    lb = np.full((3, 2), 200.0)
    ub = np.full((3, 2), 400.0)
    camera_t, _ = _ref_objects(refpnp, cam_mats, x2d, w2d, lb, ub)
    jac_buf = torch.empty((3, 32, 2, 6), dtype=torch.float64)
    x2d_t, jac_t = camera_t.project(
        torch.tensor(x3d), torch.tensor(pose), out_jac=jac_buf)

    camera_j = ep.PerspectiveCamera(jnp.asarray(cam_mats), lb=jnp.asarray(lb),
                                    ub=jnp.asarray(ub))
    x2d_j, jac_j = ep.camera_project(
        jnp.asarray(x3d), jnp.asarray(pose), camera_j, with_jac=True)
    assert bool((np.asarray(x2d_j) == 200.0).any())  # clipping engaged
    np.testing.assert_allclose(np.asarray(x2d_j), x2d_t.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(jac_j), jac_t.numpy(), atol=1e-10)


def test_pnp_normalize_roundtrip_parity(refpnp):
    import torch

    _, x3d, _, _, pose = _problem(3, 4, 16, 6)
    off_t, x3d_t, pose_t = refpnp.common.pnp_normalize(
        torch.tensor(x3d), torch.tensor(pose))
    off_j, x3d_j, pose_j = ep.pnp_normalize(jnp.asarray(x3d),
                                            jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(x3d_j), x3d_t.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pose_j), pose_t.numpy(), atol=1e-12)
    back = ep.pnp_denormalize(off_j, pose_j)
    np.testing.assert_allclose(np.asarray(back), pose, atol=1e-12)


# ---------------------------------------------------------------------------
# LM solver parity
# ---------------------------------------------------------------------------


def _ref_lm(refpnp, dof, num_iter=10):
    return refpnp.levenberg_marquardt.LMSolver(dof=dof, num_iter=num_iter)


def _patch_solve_wrapper(refpnp, monkeypatch):
    """Intended (upstream EPro-PnP) semantics for torch>=1.9 at batch>1."""
    import torch

    def solve_wrapper(b, A):
        if A.numel() > 0:
            return torch.linalg.solve(A, b)
        return b + A.reshape_as(b)

    monkeypatch.setattr(refpnp.levenberg_marquardt, "solve_wrapper",
                        solve_wrapper)


@pytest.mark.parametrize("dof,batch,patch", [(4, 1, False), (6, 1, False),
                                             (4, 5, True), (6, 5, True)])
def test_lm_trust_region_parity(refpnp, monkeypatch, dof, batch, patch):
    """Full trust-region solve from an identical deterministic init."""
    import torch

    if patch:
        _patch_solve_wrapper(refpnp, monkeypatch)
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(10 + dof, batch, 48, dof)
    # perturbed init so the trust region actually has accept/reject traffic
    pose0 = pose_gt.copy()
    pose0[:, :3] += 0.3
    if dof == 4:
        pose0[:, 3] += 0.2
    camera_t, cost_t = _ref_objects(refpnp, cam_mats, x2d, w2d)
    solver = _ref_lm(refpnp, dof)
    pose_t, cov_t, cost_val_t = solver.solve(
        torch.tensor(x3d), torch.tensor(x2d), torch.tensor(w2d),
        camera_t, cost_t, pose_init=torch.tensor(pose0),
        with_pose_cov=True, with_cost=True)

    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    pose_j, cov_j, cost_val_j = ep.lm_solve(
        jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d), camera_j,
        cost_j, jnp.asarray(pose0), ep.LMConfig(dof=dof, num_iter=10))

    np.testing.assert_allclose(np.asarray(pose_j), pose_t.numpy(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cost_val_j), cost_val_t.numpy(),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_j), cov_t.numpy(),
                               rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("dof", [4, 6])
def test_lm_fast_mode_parity(refpnp, monkeypatch, dof):
    import torch

    _patch_solve_wrapper(refpnp, monkeypatch)
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(20 + dof, 4, 48, dof)
    pose0 = pose_gt.copy()
    pose0[:, :3] += 0.2
    camera_t, cost_t = _ref_objects(refpnp, cam_mats, x2d, w2d)
    solver = _ref_lm(refpnp, dof, num_iter=5)
    pose_t, cov_t, cost_val_t = solver.solve(
        torch.tensor(x3d), torch.tensor(x2d), torch.tensor(w2d),
        camera_t, cost_t, pose_init=torch.tensor(pose0),
        with_pose_cov=True, with_cost=True, fast_mode=True)

    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    pose_j, cov_j, cost_val_j = ep.lm_solve(
        jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d), camera_j,
        cost_j, jnp.asarray(pose0), ep.LMConfig(dof=dof, num_iter=5),
        fast_mode=True)

    np.testing.assert_allclose(np.asarray(pose_j), pose_t.numpy(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cost_val_j), cost_val_t.numpy(),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_j), cov_t.numpy(),
                               rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("dof", [4, 6])
def test_gn_step_pose_add_parity(refpnp, monkeypatch, dof):
    import torch

    _patch_solve_wrapper(refpnp, monkeypatch)
    cam_mats, x3d, x2d, w2d, pose = _problem(30 + dof, 4, 32, dof)
    camera_t, cost_t = _ref_objects(refpnp, cam_mats, x2d, w2d)
    solver = _ref_lm(refpnp, dof)
    step_t = solver.gn_step(torch.tensor(x3d), torch.tensor(x2d),
                            torch.tensor(w2d), torch.tensor(pose),
                            camera_t, cost_t)
    new_t = solver.pose_add(torch.tensor(pose), step_t, camera_t)

    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    step_j = ep.gn_step(jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d),
                        jnp.asarray(pose), camera_j, cost_j, dof)
    new_j = ep.pose_add(jnp.asarray(pose), step_j, dof)
    np.testing.assert_allclose(np.asarray(step_j), step_t.numpy(), atol=1e-9)
    np.testing.assert_allclose(np.asarray(new_j), new_t.numpy(), atol=1e-9)


def test_center_based_init_parity(refpnp, monkeypatch):
    import torch

    # batch > 1 needs the corrected solve_wrapper (see module docstring)
    _patch_solve_wrapper(refpnp, monkeypatch)
    cam_mats, x3d, x2d, w2d, _ = _problem(40, 4, 32, 6)
    camera_t, _ = _ref_objects(refpnp, cam_mats, x2d, w2d)
    for dof in (4, 6):
        solver = refpnp.levenberg_marquardt.RSLMSolver(dof=dof)
        t_ref = solver.center_based_init(torch.tensor(x2d), torch.tensor(x3d),
                                         camera_t)
        camera_j, _ = _our_objects(cam_mats, x2d, w2d)
        t_j = ep.center_based_init(jnp.asarray(x2d), jnp.asarray(x3d),
                                   camera_j, dof)
        np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=1e-10)


def test_rslm_recovers_pose_without_init():
    """RSLM init + LM refinement solves from scratch (RNG differs from torch,
    so this is behavioral: the recovered pose must match GT)."""
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(50, 4, 64, 6, noise=0.2)
    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    pose, cov, cost, _ = ep.lm_solver(
        jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d), camera_j,
        cost_j, ep.LMConfig(dof=6, num_iter=10), ep.RSLMConfig(),
        key=jax.random.PRNGKey(0))
    pose = np.asarray(pose)
    np.testing.assert_allclose(pose[:, :3], pose_gt[:, :3], atol=5e-3)
    qdot = np.abs((pose[:, 3:] * pose_gt[:, 3:]).sum(1))
    assert (qdot > 0.99999).all()


# ---------------------------------------------------------------------------
# distributions vs scipy
# ---------------------------------------------------------------------------


def test_mvt_log_prob_vs_scipy():
    from scipy.stats import multivariate_t

    rng = np.random.RandomState(0)
    a = rng.normal(0, 1, (3, 3))
    cov = a @ a.T + np.eye(3)
    tril = np.linalg.cholesky(cov)
    loc = rng.normal(0, 1, 3)
    x = rng.normal(0, 2, (10, 3))
    ours = ep.mvt_log_prob(jnp.asarray(x), jnp.asarray(loc),
                           jnp.asarray(tril), df=3.0)
    ref = multivariate_t(loc, cov, df=3).logpdf(x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-10)


def test_von_mises_log_prob_vs_scipy():
    from scipy.stats import vonmises

    x = np.linspace(-3, 3, 11)
    for kappa in (0.1, 2.0, 50.0):
        ours = ep.von_mises_log_prob(jnp.asarray(x), 0.7, kappa)
        ref = vonmises(kappa, loc=0.7).logpdf(x)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-8)


def test_vm_uniform_mix_log_prob_formula():
    x = np.linspace(-3, 3, 7)
    ours = np.asarray(ep.vm_uniform_mix_log_prob(jnp.asarray(x), 0.3, 5.0))
    from scipy.stats import vonmises
    ref = np.logaddexp(vonmises(5.0, loc=0.3).logpdf(x) + math.log(0.75),
                       math.log(0.25 / (2 * math.pi)))
    np.testing.assert_allclose(ours, ref, rtol=1e-7)


def test_von_mises_sampler_statistics():
    """Best-Fisher sampler: circular mean/resultant match the analytic
    A(kappa) = I1/I0 within Monte-Carlo error."""
    from scipy.special import i0, i1

    n = 20000
    for kappa, loc in ((2.0, 0.5), (20.0, -1.0)):
        s = np.asarray(ep.von_mises_sample(
            jax.random.PRNGKey(int(kappa)), jnp.asarray(loc),
            jnp.asarray(kappa), (n,)))
        z = np.exp(1j * s)
        resultant = np.abs(z.mean())
        mean_dir = np.angle(z.mean())
        assert abs(mean_dir - loc) < 0.03
        assert abs(resultant - i1(kappa) / i0(kappa)) < 0.02


def test_acg_log_prob_and_sampler():
    rng = np.random.RandomState(1)
    a = rng.normal(0, 1, (4, 4))
    cov = a @ a.T + np.eye(4)
    cov /= np.trace(cov)
    tril = np.linalg.cholesky(cov)
    # density: integrates to 1 over S^3 (Monte-Carlo check on uniform sphere)
    u = rng.normal(0, 1, (200000, 4))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    lp = np.asarray(ep.acg_log_prob(jnp.asarray(u), jnp.asarray(tril)))
    area = 2 * math.pi ** 2  # S^3
    integral = np.exp(lp).mean() * area
    assert abs(integral - 1.0) < 0.02
    # sampler: unit-norm and density-consistent first moment of x x^T
    s = np.asarray(ep.acg_sample(jax.random.PRNGKey(0), jnp.asarray(tril),
                                 (50000,)))
    np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-6)
    # E[x x^T] under ACG(cov) has the same eigenvector order as cov
    emp = (s[:, :, None] * s[:, None, :]).mean(0)
    ev_cov = np.linalg.eigh(cov)[1][:, -1]
    ev_emp = np.linalg.eigh(emp)[1][:, -1]
    assert abs(ev_cov @ ev_emp) > 0.999


def test_safe_cholesky_fallback():
    good = jnp.eye(3) * 2.0
    bad = -jnp.eye(3)
    mats = jnp.stack([good, bad])
    tril = ep.safe_cholesky(mats, [1.0, 1.0, 4.0])
    np.testing.assert_allclose(np.asarray(tril[0]),
                               np.eye(3) * math.sqrt(2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(tril[1]), np.diag([1.0, 1.0, 4.0]))


# ---------------------------------------------------------------------------
# Monte-Carlo forward (AMIS)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dof", [4, 6])
def test_monte_carlo_forward_posterior(dof):
    """The AMIS posterior concentrates at the true pose: the importance-
    weighted translation mean lands within noise of GT, and log-weights
    are finite with a sane effective sample size."""
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(60 + dof, 2, 64, dof,
                                                noise=0.3)
    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    cfg = (ep.EProPnP4DoF if dof == 4 else ep.EProPnP6DoF)(
        mc_samples=256, num_iter=4)
    out = ep.monte_carlo_forward(
        jax.random.PRNGKey(3), cfg, jnp.asarray(x3d), jnp.asarray(x2d),
        jnp.asarray(w2d), camera_j, cost_j,
        ep.LMConfig(dof=dof, num_iter=10), ep.RSLMConfig(),
        pose_init=jnp.asarray(pose_gt), force_init_solve=True)
    pose_opt, cost, pose_opt_plus, samples, logw, cost_init = out
    assert samples.shape == (256, 2, 4 if dof == 4 else 7)
    assert logw.shape == (256, 2)
    assert bool(jnp.isfinite(logw).all())
    assert cost_init is not None and bool(jnp.isfinite(cost_init).all())
    w = np.asarray(jax.nn.softmax(logw, axis=0))
    ess = 1.0 / (w ** 2).sum(axis=0)
    assert (ess > 5).all()
    mean_t = (w[:, :, None] * np.asarray(samples[..., :3])).sum(0)
    np.testing.assert_allclose(mean_t, pose_gt[:, :3], atol=2e-2)
    np.testing.assert_allclose(np.asarray(pose_opt)[:, :3], pose_gt[:, :3],
                               atol=2e-2)
    # pose_opt_plus is the differentiable refinement of pose_opt
    np.testing.assert_allclose(np.asarray(pose_opt_plus),
                               np.asarray(pose_opt), atol=1e-3)


def test_monte_carlo_forward_grad_flows():
    """d(MC loss)/d(w2d) exists and is finite — the property the reference
    uses EPro-PnP for (training correspondence weights through the pose
    posterior, epropnp.py:87-113)."""
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(70, 2, 32, 6, noise=0.3)
    camera_j, _ = _our_objects(cam_mats, x2d, w2d)
    cfg = ep.EProPnP6DoF(mc_samples=64, num_iter=4)

    def loss_fn(w):
        cost_fun = ep.HuberPnPCost(
            delta=ep.adaptive_huber_delta(jnp.asarray(x2d), w))
        out = ep.monte_carlo_forward(
            jax.random.PRNGKey(5), cfg, jnp.asarray(x3d), jnp.asarray(x2d),
            w, camera_j, cost_fun, ep.LMConfig(dof=6, num_iter=5),
            ep.RSLMConfig(), pose_init=jnp.asarray(pose_gt))
        logw = out[4]
        # Monte-Carlo pose loss surrogate: self-normalized mean cost of the
        # target pose relative to the sample population
        return (jax.nn.softmax(logw, axis=0) * logw).sum() + out[5].sum()

    g = jax.grad(loss_fn)(jnp.asarray(w2d))
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0


def test_monte_carlo_forward_jittable():
    cam_mats, x3d, x2d, w2d, pose_gt = _problem(80, 2, 32, 4, noise=0.3)
    camera_j, cost_j = _our_objects(cam_mats, x2d, w2d)
    cfg = ep.EProPnP4DoF(mc_samples=64, num_iter=4)

    @jax.jit
    def run(x3d, x2d, w2d, pose_init):
        return ep.monte_carlo_forward(
            jax.random.PRNGKey(7), cfg, x3d, x2d, w2d, camera_j, cost_j,
            ep.LMConfig(dof=4, num_iter=5), ep.RSLMConfig(),
            pose_init=pose_init)

    out = run(jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(w2d),
              jnp.asarray(pose_gt))
    assert bool(jnp.isfinite(out[4]).all())
