"""Translation-invariant (undecimated) Haar wavelet frame, Parseval-tight.

Replaces the reference's Rice-Wavelet-Toolbox C-MEX path (`SALSA/mrdwt.m`
help stub + `mrdwt_TI2D.m`/`mirdwt_TI2D.m` wrappers + `daubcqf.m` Haar
filters) used by the wavelet-synthesis L1 experiment
(`SALSA/run_deblur_synthesis_L1.m:101-109`).  The reference wrappers rescale
the RWT transform so synthesis and analysis "correspond to multiplying by a
matrix and its transpose" (mrdwt_TI2D.m:9-13); here the frame is tight by
construction:

  per level l (dilation s = 2^l), circular boundaries, separable filters
    H a = (a + roll(a, -s)) / 2      (lowpass;  symbol (1 + e^{iωs})/2)
    G a = (a - roll(a, -s)) / 2      (highpass; symbol (1 - e^{iωs})/2)
  |h(ω)|² + |g(ω)|² = ((2+2cos ωs) + (2-2cos ωs))/4 = 1 per axis, so the
  four bands of each level resolve the identity and the recursion
  telescopes: analysisᵀ ∘ analysis = I exactly (synthesis = adjoint).
  This is the property the wavelet-L1 SALSA solve needs for its
  Sherman-Morrison LS step (run_deblur_synthesis_L1.m:170-171 relies on
  W Wᵀ = I).

Layout matches the reference's column-concatenated format
(mrdwt_TI2D.m:23: z = [lowpass, level-1 bands, level-2 bands, ...]):
analysis of an (m, n) image with L levels gives (m, n*(3L+1)).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ti_haar_analysis", "ti_haar_synthesis", "uniform_blur_kernel"]


def _analysis_1d(a: jnp.ndarray, s: int, axis: int):
    r = jnp.roll(a, -s, axis=axis)
    return (a + r) * 0.5, (a - r) * 0.5


def _adjoint_1d(lo: jnp.ndarray, hi: jnp.ndarray, s: int, axis: int):
    """Adjoint of _analysis_1d: (lo, hi) -> a with aᵀ-mapping transposed."""
    return (lo + hi) * 0.5 + jnp.roll(lo - hi, s, axis=axis) * 0.5


@partial(jax.jit, static_argnames=("levels",))
def ti_haar_analysis(x: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Analysis (the reference's WT = mrdwt_TI2D): (m, n) -> (m, n(3L+1))."""
    details = []
    ll = x
    for l in range(levels):
        s = 2**l
        lo_r, hi_r = _analysis_1d(ll, s, 0)
        ll, lh = _analysis_1d(lo_r, s, 1)
        hl, hh = _analysis_1d(hi_r, s, 1)
        details.append(jnp.concatenate([lh, hl, hh], axis=1))
    return jnp.concatenate([ll] + details, axis=1)


@partial(jax.jit, static_argnames=("levels",))
def ti_haar_synthesis(z: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Synthesis (the reference's W = mirdwt_TI2D) = analysisᵀ:
    (m, n(3L+1)) -> (m, n).  Perfect reconstruction: W(WT(x)) = x."""
    m = z.shape[0]
    n = z.shape[1] // (3 * levels + 1)
    ll = z[:, :n]
    for l in reversed(range(levels)):
        s = 2**l
        block = z[:, n * (1 + 3 * l) : n * (1 + 3 * (l + 1))]
        lh = block[:, :n]
        hl = block[:, n : 2 * n]
        hh = block[:, 2 * n :]
        lo_r = _adjoint_1d(ll, lh, s, 1)
        hi_r = _adjoint_1d(hl, hh, s, 1)
        ll = _adjoint_1d(lo_r, hi_r, s, 0)
    return ll


def uniform_blur_kernel(size: int, blur_length: int) -> np.ndarray:
    """Centered 2-D uniform (boxcar) blur kernel as a full (size, size) image
    for fft2 — reference SALSA/uniform_blur.m:1-16 (note: unlike `resize`,
    this path circularly centers the kernel via cshift)."""
    h = np.zeros(size)
    h[:blur_length] = 1.0 / blur_length
    h = np.roll(h, -(blur_length - 1) // 2)
    return np.outer(h, h)
