"""CoRAL and SPGL1 solver-zoo tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from semiblind_tv_tpu.ops import fourier, psf
from semiblind_tv_tpu.solvers.coral import coral_tv_l1
from semiblind_tv_tpu.solvers.spgl1 import project_l1_ball, spg_lasso, spgl1_bpdn
from tests import oracles

SHAPE = (32, 32)


def _make(rng, sigma=1.0):
    blur = fourier.BlurOperator(SHAPE, 7, jnp.float64)
    k = psf.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float64)
    H = blur.otf(k)
    H_full = oracles.np_otf(np.asarray(k), SHAPE)
    x = np.kron(rng.random((8, 8)) * 50, np.ones((4, 4)))
    y = oracles.np_blur(x, H_full) + sigma * rng.standard_normal(SHAPE)
    return blur, H, x, y, sigma


# ---------------------------- CoRAL ----------------------------------------

def test_coral_objective_decreases_and_improves(rng):
    blur, H, x, y, _ = _make(rng)
    res = coral_tv_l1(jnp.asarray(y), H, tau_tv=0.3, tau_l1=0.01, blur=blur,
                      mu1=0.03, mu2=0.03, max_iter=150, tol=1e-8,
                      x_true=jnp.asarray(x))
    assert res.objective[res.n_iters] < res.objective[0]
    assert res.mses[res.n_iters - 1] < np.mean((y - x) ** 2)


def test_coral_early_stop(rng):
    blur, H, x, y, _ = _make(rng)
    res = coral_tv_l1(jnp.asarray(y), H, 0.3, 0.01, blur, mu1=0.03, mu2=0.03,
                      max_iter=400, tol=1e-3)
    assert res.n_iters < 400


# ---------------------------- SPGL1 ----------------------------------------

def test_project_l1_ball(rng):
    v = rng.standard_normal((16, 16)) * 5
    for tau in [1.0, 10.0, 1e6]:
        p = np.asarray(project_l1_ball(jnp.asarray(v), tau))
        assert np.sum(np.abs(p)) <= tau * (1 + 1e-8)
    # interior point unchanged
    big = np.asarray(project_l1_ball(jnp.asarray(v), 1e9))
    np.testing.assert_allclose(big, v, rtol=1e-12)
    # projection is the closest point: compare against scipy-style oracle
    tau = 10.0
    p = np.asarray(project_l1_ball(jnp.asarray(v), tau)).ravel()
    u = np.sort(np.abs(v.ravel()))[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, len(u) + 1) > (css - tau))[0][-1]
    theta = (css[rho] - tau) / (rho + 1.0)
    want = np.sign(v.ravel()) * np.maximum(np.abs(v.ravel()) - theta, 0)
    np.testing.assert_allclose(p, want, rtol=1e-9, atol=1e-10)


def test_spg_lasso_respects_ball_and_decreases(rng):
    blur, H, x, y, _ = _make(rng)
    tau = 0.5 * float(np.sum(np.abs(x)))
    xs, resid, g, n = spg_lasso(jnp.asarray(y), H, blur, tau, max_iter=100)
    assert float(jnp.sum(jnp.abs(xs))) <= tau * (1 + 1e-6)
    assert float(resid) < float(np.linalg.norm(y))  # better than x=0


def test_spgl1_bpdn_reaches_sigma(rng):
    blur, H, x, y, sigma = _make(rng, sigma=1.0)
    target = np.sqrt(y.size) * sigma
    res = spgl1_bpdn(jnp.asarray(y), H, blur, sigma=target,
                     max_newton=8, inner_iter=150)
    assert res.resid_norm <= target * 1.2
    assert res.tau > 0
    assert np.all(np.isfinite(res.x))
