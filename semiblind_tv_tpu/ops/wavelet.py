"""Translation-invariant (undecimated) Daubechies wavelet frames, Parseval-tight.

Replaces the reference's Rice-Wavelet-Toolbox C-MEX path (`SALSA/mrdwt.m`
help stub + `mrdwt_TI2D.m`/`mirdwt_TI2D.m` wrappers + `daubcqf.m` filter
generation) used by the wavelet-synthesis L1 experiment
(`SALSA/run_deblur_synthesis_L1.m:101-109`).  The reference wrappers rescale
the RWT transform so synthesis and analysis "correspond to multiplying by a
matrix and its transpose" (mrdwt_TI2D.m:9-13); here the frame is tight by
construction:

  Let (h, g) be an orthonormal CQF pair with ‖h‖₂ = 1 (daubcqf output) and
  scale both by 1/√2 (exactly the reference wrappers' 2^{-level} rescaling:
  1/2 per level = 1/√2 per axis).  The à-trous analysis at level l uses the
  filters dilated by s = 2^l with circular boundaries.  CQF orthonormality
  (Σ_k h[k]h[k+2m] = δ_m, g[k] = (−1)^k h[N−1−k]) gives
  autocorr_h(m) + autocorr_g(m) = 2δ_m, so after the 1/√2 scaling
  HᵀH + GᵀG = I per axis, the four bands of each level resolve the identity,
  and the recursion telescopes: analysisᵀ ∘ analysis = I exactly
  (synthesis = adjoint).  This is the property the wavelet-L1 SALSA solve
  needs for its Sherman-Morrison LS step (run_deblur_synthesis_L1.m:170-171
  relies on W Wᵀ = I).  Haar (N=2) reduces to H a = (a + roll(a,−s))/2.

Layout matches the reference's column-concatenated format
(mrdwt_TI2D.m:23: z = [lowpass, level-1 bands, level-2 bands, ...]):
analysis of an (m, n) image with L levels gives (m, n*(3L+1)).
"""
from __future__ import annotations

from functools import partial
from math import comb

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "daubcqf",
    "ti_analysis",
    "ti_synthesis",
    "ti_haar_analysis",
    "ti_haar_synthesis",
    "uniform_blur_kernel",
]


def daubcqf(N: int, phase: str = "min"):
    """Daubechies length-N orthonormal CQF pair (h0 scaling, h1 wavelet).

    Capability parity with `SALSA/daubcqf.m:1-106` ('min'/'max'/'mid'
    phases), via the standard spectral factorization (Daubechies, CPAM
    1988) — NOT a port of the MATLAB root bookkeeping:

      h0(z) ∝ ((1+z)/2)^K · Q(z),  K = N/2, where Q collects, for each root
      y_j of the binomial polynomial P(y) = Σ_{k<K} C(K−1+k, k) y^k, one
      z-root of z² − (2−4y_j)z + 1 = 0 per reciprocal pair: the one inside
      the unit circle (minimum phase) by default.  'mid' applies the
      reference's mixed in/out selection over the magnitude-sorted root
      list (daubcqf.m:92-98) for near-linear phase; 'max' reverses the
      min-phase filter.  Normalized to Σ h0 = √2 (so ‖h0‖₂ = 1);
      h1[k] = (−1)^k h0[N−1−k] (the reference's rot90 + odd-index negation,
      daubcqf.m:103-104).

    >>> daubcqf(4)[0]   # doctest reference values from daubcqf.m:20-24
    array([ 0.48296291,  0.83651630,  0.22414387, -0.12940952])
    """
    if N % 2 != 0 or N < 2:
        raise ValueError("Daubechies filters require even N >= 2")
    if phase not in ("min", "max", "mid"):
        raise ValueError(f"phase must be 'min', 'max' or 'mid', got {phase!r}")
    K = N // 2
    # binomial half-band polynomial P(y), ascending coefficients
    P = np.array([comb(K - 1 + k, k) for k in range(K)], dtype=np.float64)
    zroots = []
    if K > 1:
        pairs = []
        for y in np.roots(P[::-1]):
            b = 2.0 - 4.0 * y
            disc = np.sqrt(b * b - 4.0 + 0j)
            pairs.extend([(b + disc) / 2.0, (b - disc) / 2.0])
        if phase == "mid" and K > 2:
            # MATLAB: q = sort(roots(q)); qt = q(<mixed index set>)
            # (daubcqf.m:91-98).  MATLAB sorts complex by |z| then angle.
            q = sorted(pairs, key=lambda z: (abs(z), np.angle(z)))
            if K % 2 == 1:
                idx = list(range(0, N - 2, 4)) + list(range(1, N - 2, 4))
            else:
                idx = (
                    [0]
                    + list(range(3, K - 1, 4))
                    + list(range(4, K - 1, 4))
                    + list(range(N - 4, K - 2, -4))
                    + list(range(N - 5, K - 2, -4))
                )
            zroots = [q[i] for i in idx]
        else:
            # one in-circle root per reciprocal pair (minimum phase)
            zroots = [z for z in pairs if abs(z) <= 1.0]
    # binomial part (1+z)^K: K+1 taps; Q part K-1 roots: K taps -> N = 2K taps
    h0 = np.array([1.0])
    for _ in range(K):
        h0 = np.convolve(h0, [1.0, 1.0])
    if zroots:
        h0 = np.convolve(h0, np.real(np.poly(np.array(zroots))))
    h0 = np.sqrt(2.0) * h0 / h0.sum()
    if abs(np.sum(h0**2) - 1.0) > 1e-4:
        raise ValueError(f"daubcqf numerically unstable for N={N}")
    if phase == "max":
        h0 = h0[::-1].copy()
    h1 = h0[::-1].copy()
    h1[::2] *= -1.0
    return h0, h1


def _filters(wavelet_order: int, dtype):
    """(h, g) analysis filters scaled by 1/√2 for a tight (constant-1) frame."""
    h0, h1 = daubcqf(wavelet_order)
    s = 1.0 / np.sqrt(2.0)
    return tuple((h0 * s).astype(dtype)), tuple((h1 * s).astype(dtype))


def _filt_1d(a: jnp.ndarray, taps, s: int, axis: int):
    """Circular à-trous correlation: (F a)[i] = Σ_k taps[k] a[i + s·k]."""
    out = taps[0] * a
    for k in range(1, len(taps)):
        out = out + taps[k] * jnp.roll(a, -s * k, axis=axis)
    return out


def _filt_adj_1d(b: jnp.ndarray, taps, s: int, axis: int):
    """Adjoint of _filt_1d: (Fᵀ b)[j] = Σ_k taps[k] b[j − s·k]."""
    out = taps[0] * b
    for k in range(1, len(taps)):
        out = out + taps[k] * jnp.roll(b, s * k, axis=axis)
    return out


@partial(jax.jit, static_argnames=("levels", "wavelet_order"))
def ti_analysis(x: jnp.ndarray, levels: int, wavelet_order: int = 2) -> jnp.ndarray:
    """Undecimated analysis (the reference's WT = mrdwt_TI2D with
    daubcqf(wavelet_order) filters): (m, n) -> (m, n(3L+1))."""
    h, g = _filters(wavelet_order, x.dtype)
    details = []
    ll = x
    for l in range(levels):
        s = 2**l
        lo_r = _filt_1d(ll, h, s, 0)
        hi_r = _filt_1d(ll, g, s, 0)
        ll = _filt_1d(lo_r, h, s, 1)
        lh = _filt_1d(lo_r, g, s, 1)
        hl = _filt_1d(hi_r, h, s, 1)
        hh = _filt_1d(hi_r, g, s, 1)
        details.append(jnp.concatenate([lh, hl, hh], axis=1))
    return jnp.concatenate([ll] + details, axis=1)


@partial(jax.jit, static_argnames=("levels", "wavelet_order"))
def ti_synthesis(z: jnp.ndarray, levels: int, wavelet_order: int = 2) -> jnp.ndarray:
    """Undecimated synthesis (the reference's W = mirdwt_TI2D) = analysisᵀ:
    (m, n(3L+1)) -> (m, n).  Tight frame: W(WT(x)) = x at every order."""
    h, g = _filters(wavelet_order, z.dtype)
    n = z.shape[1] // (3 * levels + 1)
    ll = z[:, :n]
    for l in reversed(range(levels)):
        s = 2**l
        block = z[:, n * (1 + 3 * l) : n * (1 + 3 * (l + 1))]
        lh = block[:, :n]
        hl = block[:, n : 2 * n]
        hh = block[:, 2 * n :]
        lo_r = _filt_adj_1d(ll, h, s, 1) + _filt_adj_1d(lh, g, s, 1)
        hi_r = _filt_adj_1d(hl, h, s, 1) + _filt_adj_1d(hh, g, s, 1)
        ll = _filt_adj_1d(lo_r, h, s, 0) + _filt_adj_1d(hi_r, g, s, 0)
    return ll


def ti_haar_analysis(x: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Haar (order-2) analysis — the run_deblur_synthesis_L1 configuration."""
    return ti_analysis(x, levels, wavelet_order=2)


def ti_haar_synthesis(z: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Haar (order-2) synthesis = analysisᵀ."""
    return ti_synthesis(z, levels, wavelet_order=2)


def uniform_blur_kernel(size: int, blur_length: int) -> np.ndarray:
    """Centered 2-D uniform (boxcar) blur kernel as a full (size, size) image
    for fft2 — reference SALSA/uniform_blur.m:1-16 (note: unlike `resize`,
    this path circularly centers the kernel via cshift)."""
    h = np.zeros(size)
    h[:blur_length] = 1.0 / blur_length
    h = np.roll(h, -(blur_length - 1) // 2)
    return np.outer(h, h)
