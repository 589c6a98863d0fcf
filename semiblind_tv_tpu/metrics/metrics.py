"""Image-quality metrics with reference-MATLAB semantics.

  * mse_db — `utils/MSE.m:1-4`: 10 log10(‖x − x̂‖²_F / d)
  * psnr   — `utils/PSNR.m`: 10 log10(max(x)²) − 10 log10(‖x − y‖² / d)
  * snr    — `utils/snr_func.m`: 20 log10(‖x‖ / ‖x − y‖)
  * l2_spectral_sq — `utils/l2.m`: MATLAB `norm(x-y)^2` on a matrix is the
    spectral norm squared (largest singular value squared)
  * ssim   — MATLAB-style SSIM (11×11 Gaussian window, σ=1.5,
    K=[0.01, 0.03]).  The demos call `ssim(x, xMAP)` on double images in
    [0, 255] without a DynamicRange argument, so MATLAB uses its
    double-precision default L=1 (run_Gaussian_demo.m:245); `dynamic_range`
    defaults to 1.0 to reproduce that, pass 255.0 for the conventional value.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mse_db", "psnr", "snr", "l2_spectral_sq", "ssim"]


def mse_db(x_true, x_app):
    d = x_true.size
    return 10.0 * jnp.log10(jnp.sum((x_true - x_app) ** 2) / d)


def psnr(x, y):
    d = x.size
    peak = 10.0 * jnp.log10(jnp.max(x) ** 2)
    return peak - 10.0 * jnp.log10(jnp.sum((x - y) ** 2) / d)


def snr(x, y):
    return 20.0 * jnp.log10(jnp.linalg.norm(x) / jnp.linalg.norm(x - y))


def l2_spectral_sq(x, y):
    s = jnp.linalg.svd(x - y, compute_uv=False)
    return s[0] ** 2


def _gaussian_window(size: int = 11, sigma: float = 1.5, dtype=jnp.float32):
    offs = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g1 = jnp.exp(-(offs**2) / (2.0 * sigma**2))
    win = jnp.outer(g1, g1)
    return win / jnp.sum(win)


def _filter2_replicate(img, win):
    """2-D correlation with replicate (edge) padding, 'same' output."""
    s = win.shape[0]
    p = s // 2
    padded = jnp.pad(img, ((p, p), (p, p)), mode="edge")
    out = jax.lax.conv_general_dilated(
        padded[None, None],
        win[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


def ssim(x, y, dynamic_range: float = 1.0, k1: float = 0.01, k2: float = 0.03):
    """Mean structural similarity index (MATLAB `ssim` semantics)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    win = _gaussian_window(dtype=x.dtype)
    c1 = (k1 * dynamic_range) ** 2
    c2 = (k2 * dynamic_range) ** 2

    mu_x = _filter2_replicate(x, win)
    mu_y = _filter2_replicate(y, win)
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sig_x2 = _filter2_replicate(x * x, win) - mu_x2
    sig_y2 = _filter2_replicate(y * y, win) - mu_y2
    sig_xy = _filter2_replicate(x * y, win) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x2 + sig_y2 + c2)
    return jnp.mean(num / den)
