"""Constrained SALSA vs a NumPy oracle of the reference loop."""
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu.ops import fourier, psf
from semiblind_tv_tpu.solvers.csalsa import csalsa_tv
from tests import oracles

SHAPE = (32, 32)


def _np_csalsa(y, H, mu1, mu2, eps, delta, max_iter, tol, tv_iters, stop_criterion=1):
    """CSALSA_v2.m:462-545 with TV initialization, x0 = 0."""
    A = lambda v: oracles.np_blur(v, H)
    AT = lambda v: oracles.np_blur_adj(v, H)
    absH2 = np.abs(H) ** 2
    x = np.zeros_like(y)
    u = np.zeros_like(y); bu = np.zeros_like(y)
    v = np.zeros_like(y); bv = np.zeros_like(y)
    pux = np.zeros_like(y); puy = np.zeros_like(y)
    prev_obj = oracles.np_tv(x)
    prev_crit = np.linalg.norm(A(x) - y)
    n = 0
    for k in range(max_iter):
        r = mu1 * (u + bu) + mu2 * AT(y + v + bv)
        x_new = np.real(np.fft.ifft2(np.fft.fft2(r) / (mu2 * absH2 + mu1)))
        u, pux, puy, _, _ = oracles.np_chambolle(
            x_new - bu, 1.0 / mu1, tv_iters, duals=(pux, puy)
        )
        Ax = A(x_new)
        ve = Ax - y - bv
        n_ve = np.linalg.norm(ve)
        v = ve if n_ve <= eps else ve / n_ve * eps
        bv = bv - (Ax - y - v)
        bu = bu - (x_new - u)
        crit = np.linalg.norm(Ax - y)
        obj = oracles.np_tv(x_new)
        xprev, x = x, x_new
        n += 1
        if k >= 1:
            if stop_criterion == 1:
                sc = abs(obj - prev_obj) / obj
            if sc < tol and crit <= eps:
                mu1 *= delta; mu2 *= delta
                prev_obj, prev_crit = obj, crit
                break
        mu1 *= delta; mu2 *= delta
        prev_obj, prev_crit = obj, crit
    return x, prev_obj, prev_crit, n


def _make(rng):
    blur = fourier.BlurOperator(SHAPE, 7, jnp.float64)
    k = psf.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float64)
    H = blur.otf(k)
    H_full = oracles.np_otf(np.asarray(k), SHAPE)
    x = np.kron(rng.random((8, 8)) * 100, np.ones((4, 4)))
    sigma = 1.0
    y = oracles.np_blur(x, H_full) + sigma * rng.standard_normal(SHAPE)
    return blur, H, H_full, x, y, sigma


def test_csalsa_matches_oracle(rng):
    blur, H, H_full, x, y, sigma = _make(rng)
    eps = float(np.sqrt(y.size + 8 * np.sqrt(y.size)) * sigma)
    res = csalsa_tv(jnp.asarray(y), H, mu1=0.05, mu2=1.0, blur=blur,
                    epsilon=eps, max_iter=30, tol=1e-12, tv_iters=10)
    ox, oobj, ocrit, on = _np_csalsa(y, H_full, 0.05, 1.0, eps, 1.0, 30, 1e-12, 10)
    np.testing.assert_allclose(res.x, ox, rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(res.objective[-1], oobj, rtol=1e-8)
    np.testing.assert_allclose(res.criterion[-1], ocrit, rtol=1e-8)
    assert res.n_iters == on


def test_csalsa_constraint_and_improvement(rng):
    blur, H, H_full, x, y, sigma = _make(rng)
    res = csalsa_tv(jnp.asarray(y), H, mu1=0.05, mu2=1.0, blur=blur,
                    sigma=sigma, max_iter=300, tol=1e-5, x_true=jnp.asarray(x))
    eps = float(np.sqrt(y.size + 8 * np.sqrt(y.size)) * sigma)
    assert res.criterion[res.n_iters - 1] <= eps * 1.05
    assert res.mses[res.n_iters - 1] < np.mean((y - x) ** 2)


def test_csalsa_default_epsilon_requires_sigma(rng):
    blur, H, _, _, y, _ = _make(rng)
    import pytest

    with pytest.raises(ValueError):
        csalsa_tv(jnp.asarray(y), H, 0.05, 1.0, blur)
