"""TI-Haar frame: perfect reconstruction, tightness, adjointness."""
import jax.numpy as jnp
import numpy as np
import pytest

from semiblind_tv_tpu.ops.wavelet import (
    ti_haar_analysis,
    ti_haar_synthesis,
    uniform_blur_kernel,
)


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_perfect_reconstruction(rng, levels):
    x = rng.standard_normal((32, 32))
    z = ti_haar_analysis(jnp.asarray(x), levels)
    assert z.shape == (32, 32 * (3 * levels + 1))
    xr = ti_haar_synthesis(z, levels)
    np.testing.assert_allclose(xr, x, rtol=1e-10, atol=1e-12)


def test_adjointness(rng):
    levels = 3
    x = rng.standard_normal((16, 16))
    z = rng.standard_normal((16, 16 * (3 * levels + 1)))
    lhs = float(jnp.sum(ti_haar_analysis(jnp.asarray(x), levels) * z))
    rhs = float(jnp.sum(jnp.asarray(x) * ti_haar_synthesis(jnp.asarray(z), levels)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_parseval(rng):
    x = rng.standard_normal((16, 16))
    z = ti_haar_analysis(jnp.asarray(x), 4)
    np.testing.assert_allclose(float(jnp.sum(z * z)), np.sum(x * x), rtol=1e-10)


def test_uniform_blur_kernel():
    k = uniform_blur_kernel(16, 9)
    assert np.isclose(k.sum(), 1.0)
    # centered circularly: mass is at corners/top rows (kernel peak wraps 0)
    h = np.zeros(16); h[:9] = 1 / 9.0
    h = np.roll(h, -4)
    np.testing.assert_allclose(k, np.outer(h, h))
