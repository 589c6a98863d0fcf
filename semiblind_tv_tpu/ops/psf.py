"""Parametric PSF families (Gaussian / Laplace / Moffat) and their analytic
parameter gradients.

Capability parity with the reference MATLAB implementations (all formulas
re-derived, vectorised, and differentiable):

  * Gaussian: `utils/Gaussian_psf.m:1-19`, grads `utils/diff_fftgaus_w{1,2}.m`
    and sums `utils/Sum_gauss_psf.m:1-28`.
  * Laplace:  `utils/psf_laplace.m:1-13`, grad `utils/diff_laplace_b.m:6-18`,
    sums `utils/sum_lap_psf.m:1-28`.
  * Moffat:   `utils/psf_moffat.m:1-20`, grads `utils/diff_moffat_{alpha,beta}.m`,
    sums `utils/sum_mof_psf.m:1-40`.

All kernels are normalised to sum to one; the gradient of the *normalised*
kernel follows the quotient rule

    d(k / S) / dp = (dk * S - k * dS) / S^2,      S = sum(k), dS = sum(dk)

exactly as the reference computes it.  Every function here is pure jnp and
`jax.grad`-compatible, so the analytic gradients can be (and are, in the
tests) cross-checked against autodiff.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "psf_grid",
    "gaussian_kernel",
    "gaussian_kernel_grads",
    "laplace_kernel",
    "laplace_kernel_grads",
    "moffat_kernel",
    "moffat_kernel_grads",
]


def psf_grid(size: int, dtype=jnp.float32):
    """Centered integer offset grid for an odd `size` x `size` kernel.

    Returns (v, u): v varies along rows, u along columns — matching the
    reference's `[v,u] = ndgrid(x,y)` convention (utils/Gaussian_psf.m:8).
    """
    offs = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    v = offs[:, None] * jnp.ones((1, size), dtype)
    u = jnp.ones((size, 1), dtype) * offs[None, :]
    return v, u


# ---------------------------------------------------------------------------
# Gaussian (anisotropic, rotated):  k ∝ (w1 w2 / 2π) exp(-(w1²U² + w2²V²)/2)
# ---------------------------------------------------------------------------

def _gaussian_unnormalised(size, w1, w2, phi, dtype):
    v, u = psf_grid(size, dtype)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    U = u * cphi - v * sphi
    V = u * sphi + v * cphi
    c = w1 ** 2 * U ** 2 + w2 ** 2 * V ** 2
    e = jnp.exp(-c / 2.0)
    f = (w1 * w2) / (2.0 * jnp.pi) * e
    return f, e, U, V


def gaussian_kernel(size: int, w1, w2, phi=0.0, dtype=jnp.float32):
    """Normalised anisotropic rotated Gaussian PSF (reference Gaussian_psf.m)."""
    f, _, _, _ = _gaussian_unnormalised(size, w1, w2, phi, dtype)
    return f / jnp.sum(f)


def gaussian_kernel_grads(size: int, w1, w2, phi=0.0, dtype=jnp.float32):
    """(kernel, dk/dw1, dk/dw2) of the normalised Gaussian PSF.

    Unnormalised partials (reference diff_fftgaus_w1.m:22, diff_fftgaus_w2.m:22):
      df/dw1 = (w2/2π)(1 - w1²U²) exp(-c/2)
      df/dw2 = (w1/2π)(1 - w2²V²) exp(-c/2)
    """
    f, e, U, V = _gaussian_unnormalised(size, w1, w2, phi, dtype)
    dw1 = (w2 / (2.0 * jnp.pi)) * (1.0 - w1 ** 2 * U ** 2) * e
    dw2 = (w1 / (2.0 * jnp.pi)) * (1.0 - w2 ** 2 * V ** 2) * e
    S = jnp.sum(f)
    S1 = jnp.sum(dw1)
    S2 = jnp.sum(dw2)
    k = f / S
    dk1 = (dw1 * S - f * S1) / (S ** 2)
    dk2 = (dw2 * S - f * S2) / (S ** 2)
    return k, dk1, dk2


# ---------------------------------------------------------------------------
# Laplace:  k ∝ (b²/4) exp(-b(|x| + |y|))
# ---------------------------------------------------------------------------

def _laplace_abs_grid(size, dtype):
    v, u = psf_grid(size, dtype)
    # reference loops use lap(ii,jj) = g(x(ii), y(jj)) with ii the row index,
    # i.e. the row offset is x(ii) and the column offset is y(jj); with a
    # symmetric grid |v| + |u| is identical.
    return jnp.abs(v) + jnp.abs(u)


def laplace_kernel(size: int, b, dtype=jnp.float32):
    """Normalised Laplace PSF (reference psf_laplace.m)."""
    r1 = _laplace_abs_grid(size, dtype)
    f = (b ** 2 / 4.0) * jnp.exp(-b * r1)
    return f / jnp.sum(f)


def laplace_kernel_grads(size: int, b, dtype=jnp.float32):
    """(kernel, dk/db) of the normalised Laplace PSF.

    Unnormalised partial (reference diff_laplace_b.m:10-13, sum_lap_psf.m:20-24):
      df/db = ((2b - b²(|x|+|y|)) / 4) exp(-b(|x|+|y|))
    """
    r1 = _laplace_abs_grid(size, dtype)
    e = jnp.exp(-b * r1)
    f = (b ** 2 / 4.0) * e
    db = ((2.0 * b - b ** 2 * r1) / 4.0) * e
    S = jnp.sum(f)
    Sd = jnp.sum(db)
    k = f / S
    dk = (db * S - f * Sd) / (S ** 2)
    return k, dk


# ---------------------------------------------------------------------------
# Moffat:  k ∝ (a²/2π) (1 + a² r² / b)^(-(b+2)/2)
# ---------------------------------------------------------------------------

def _moffat_r2(size, dtype):
    v, u = psf_grid(size, dtype)
    return v ** 2 + u ** 2


def moffat_kernel(size: int, a, b, dtype=jnp.float32):
    """Normalised Moffat PSF (reference psf_moffat.m)."""
    r2 = _moffat_r2(size, dtype)
    f = a ** 2 * (r2 * a ** 2 / b + 1.0) ** (-(b + 2.0) / 2.0) / (2.0 * jnp.pi)
    return f / jnp.sum(f)


def moffat_kernel_grads(size: int, a, b, dtype=jnp.float32):
    """(kernel, dk/da, dk/db) of the normalised Moffat PSF.

    Unnormalised partials (reference diff_moffat_alpha.m:17, diff_moffat_beta.m:18):
      df/da = (2 - (b+2) r² a² / (2(b + r² a²))) (1 + a²r²/b)^(-(b+2)/2) (a/2π)
      df/db = (-log(a²r²/b + 1) + (b+2) a²r² / (b(b + a²r²)))
              (a²r²/b + 1)^(-(b+2)/2) (a²/4π)

    PARITY QUIRK: the reference's df/da is NOT the exact derivative — the
    exact second term is (b+2) r² a² / (b + r² a²), without the factor 2 in
    the denominator (verify with jax.jacfwd of moffat_kernel).  The
    reference's SAPG-Moffat trajectory is driven by its formula, so we
    reproduce it verbatim; df/db IS exact and is autodiff-checked in tests.
    """
    r2 = _moffat_r2(size, dtype)
    base = r2 * a ** 2 / b + 1.0
    pw = base ** (-(b + 2.0) / 2.0)
    f = a ** 2 * pw / (2.0 * jnp.pi)
    da = (2.0 - ((b + 2.0) * r2 * a ** 2) / (2.0 * (b + r2 * a ** 2))) * pw * (
        a / (2.0 * jnp.pi)
    )
    db = (
        -jnp.log(base) + ((b + 2.0) * r2 * a ** 2) / (b * (b + r2 * a ** 2))
    ) * pw * (a ** 2 / (4.0 * jnp.pi))
    S = jnp.sum(f)
    Sa = jnp.sum(da)
    Sb = jnp.sum(db)
    k = f / S
    dka = (da * S - f * Sa) / (S ** 2)
    dkb = (db * S - f * Sb) / (S ** 2)
    return k, dka, dkb
