"""NESTA solver: constraint satisfaction, objective decrease, both priors."""
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu.ops import fourier, psf
from semiblind_tv_tpu.ops.tv import tv_norm
from semiblind_tv_tpu.solvers.nesta import nesta
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


def test_nesta_tv_deblurs(rng):
    blur, H, x, y, sigma = _make(rng)
    delta = np.sqrt(y.size) * sigma
    res = nesta(jnp.asarray(y), H, blur, muf=0.1, delta=delta,
                type_min="tv", max_iter=300)
    # constraint approximately satisfied and TV reduced vs observation
    final_resid = float(np.linalg.norm(
        y - oracles.np_blur(res.x, oracles.np_otf(
            np.asarray(psf.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float64)), SHAPE))
    ))
    # the delta-ball projection is exact only for AA^T = c I (NESTA's
    # assumption, shared with the vendored reference); for a blur operator it
    # is approximate — assert it still pulls the residual near delta
    assert final_resid <= delta * 3.0
    assert float(tv_norm(jnp.asarray(res.x))) < float(tv_norm(jnp.asarray(y)))
    mse_x = np.mean((res.x - x) ** 2)
    mse_y = np.mean((y - x) ** 2)
    assert mse_x < mse_y


def test_nesta_l1_mode_runs(rng):
    blur, H, x, y, sigma = _make(rng)
    delta = np.sqrt(y.size) * sigma
    res = nesta(jnp.asarray(y), H, blur, muf=0.05, delta=delta,
                type_min="l1", max_iter=150)
    assert np.all(np.isfinite(res.x))
    assert res.n_iters > 0
    assert res.mu_final < 1.0


def test_nesta_continuation_shrinks_mu(rng):
    blur, H, x, y, sigma = _make(rng)
    res = nesta(jnp.asarray(y), H, blur, muf=0.01,
                delta=np.sqrt(y.size) * sigma, max_int_iter=4, max_iter=60)
    assert np.isclose(res.mu_final, 0.01, rtol=1e-6)
