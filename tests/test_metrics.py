"""Metric functions vs direct NumPy evaluation / known identities."""
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu import metrics


def test_mse_db(rng):
    x = rng.standard_normal((16, 16))
    y = rng.standard_normal((16, 16))
    want = 10 * np.log10(np.sum((x - y) ** 2) / x.size)
    np.testing.assert_allclose(metrics.mse_db(jnp.asarray(x), jnp.asarray(y)), want, rtol=1e-10)


def test_psnr(rng):
    x = np.abs(rng.standard_normal((8, 8))) + 0.1
    y = x + 0.01 * rng.standard_normal((8, 8))
    want = 10 * np.log10(x.max() ** 2) - 10 * np.log10(np.sum((x - y) ** 2) / x.size)
    np.testing.assert_allclose(metrics.psnr(jnp.asarray(x), jnp.asarray(y)), want, rtol=1e-9)


def test_snr(rng):
    x = rng.standard_normal((8, 8))
    y = x + 0.1 * rng.standard_normal((8, 8))
    want = 20 * np.log10(np.linalg.norm(x) / np.linalg.norm(x - y))
    np.testing.assert_allclose(metrics.snr(jnp.asarray(x), jnp.asarray(y)), want, rtol=1e-9)


def test_l2_spectral(rng):
    x = rng.standard_normal((7, 7))
    y = rng.standard_normal((7, 7))
    want = np.linalg.norm(x - y, ord=2) ** 2  # MATLAB norm(matrix)^2
    np.testing.assert_allclose(metrics.l2_spectral_sq(jnp.asarray(x), jnp.asarray(y)), want, rtol=1e-9)


def test_ssim_identity(rng):
    x = jnp.asarray(rng.standard_normal((64, 64)))
    assert float(metrics.ssim(x, x)) > 0.9999


def test_ssim_degrades(rng):
    x = jnp.asarray(np.abs(rng.standard_normal((64, 64))))
    y = x + 0.5 * jnp.asarray(rng.standard_normal((64, 64)))
    assert float(metrics.ssim(x, y)) < float(metrics.ssim(x, x))
