"""SPGL1 — spectral projected gradient for basis pursuit denoise.

Re-design of the vendored reference `SALSA/spgl1_v0.m:1-893` (van den Berg
& Friedlander's SPGL1; unused by the live demos but part of the solver-zoo
capability surface).  Two entry points:

  * spg_lasso: min ½‖Ax − b‖²  s.t.  ‖x‖₁ ≤ τ
      projected Barzilai–Borwein gradient descent with a nonmonotone
      (last-10) line search and exact sort-based L1-ball projection.
  * spgl1_bpdn: min ‖x‖₁  s.t.  ‖Ax − b‖ ≤ σ
      Newton root-finding on the Pareto curve φ(τ) = ‖r(τ)‖ with
      φ'(τ) = −‖Aᵀr‖_∞ / ‖r‖  (the SPGL1 update
      τ ← τ + ‖r‖(‖r‖ − σ)/‖Aᵀr‖_∞).

The inner solver is one fixed-trip lax.scan (masked early exit); each
iteration costs one A and one Aᵀ apply on the rfft grid plus one sort for
the projection.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu.ops.fourier import BlurOperator

__all__ = ["SPGL1Result", "project_l1_ball", "spg_lasso", "spgl1_bpdn"]


@dataclasses.dataclass
class SPGL1Result:
    x: np.ndarray
    tau: float
    resid_norm: float
    n_iters: int
    n_newton: int


def project_l1_ball(v: jnp.ndarray, tau) -> jnp.ndarray:
    """Euclidean projection onto {x : ‖x‖₁ ≤ τ} (sort-based, exact)."""
    shape = v.shape
    u = jnp.abs(v).ravel()
    s = jnp.sort(u)[::-1]
    cums = jnp.cumsum(s)
    k = jnp.arange(1, u.size + 1, dtype=v.dtype)
    thresh_cand = (cums - tau) / k
    ok = s - thresh_cand > 0
    rho = jnp.max(jnp.where(ok, jnp.arange(u.size), -1))
    theta = jnp.maximum((cums[rho] - tau) / (rho + 1.0), 0.0)
    inside = jnp.sum(u) <= tau
    theta = jnp.where(inside, 0.0, theta)
    out = jnp.sign(v) * jnp.maximum(jnp.abs(v) - theta, 0.0)
    return out.reshape(shape)


def _make_ops(H, blur):
    H = np.asarray(H)
    absH2 = H.real**2 + H.imag**2

    def A(v):
        return blur.irfft(H * blur.rfft(v))

    def At(v):
        return blur.irfft(np.conj(H) * blur.rfft(v))

    return A, At, absH2


def spg_lasso(
    b: jnp.ndarray,
    H,
    blur: BlurOperator,
    tau: float,
    x0: Optional[jnp.ndarray] = None,
    max_iter: int = 200,
    tol: float = 1e-6,
    history: int = 10,
    max_ls: int = 10,
):
    """Inner LASSO solver; returns (x, resid_norm, grad, n_iters)."""
    dtype = blur.dtype
    b = jnp.asarray(b, dtype)
    A, At, _ = _make_ops(H, blur)

    def f_and_g(x):
        r = A(x) - b
        return 0.5 * jnp.sum(r * r), At(r), r

    def body(carry, _):
        x, g, f, alpha, fbuf, done, n_done = carry
        active = jnp.logical_not(done)
        fmax = jnp.max(fbuf)

        def ls_body(state):
            a, k = state
            return a * 0.5, k + 1

        def ls_cond(state):
            a, k = state
            xn = project_l1_ball(x - a * g, tau)
            d = xn - x
            fn = 0.5 * jnp.sum((A(xn) - b) ** 2)
            suff = fn <= fmax + 1e-4 * jnp.sum(g * d)
            return jnp.logical_and(jnp.logical_not(suff), k < max_ls)

        a_fin, _ = jax.lax.while_loop(ls_cond, ls_body, (alpha, 0))
        xn = project_l1_ball(x - a_fin * g, tau)
        fn, gn, _ = f_and_g(xn)

        s = xn - x
        yv = gn - g
        sy = jnp.sum(s * yv)
        alpha_n = jnp.where(
            sy > 1e-12, jnp.clip(jnp.sum(s * s) / sy, 1e-6, 1e6), 1.0
        )
        step = jnp.linalg.norm(s) / jnp.maximum(jnp.linalg.norm(xn), 1.0)
        newly = jnp.logical_and(step < tol, active)

        keep = lambda aa, oo: jnp.where(active, aa, oo)
        fbuf = jnp.where(active, jnp.roll(fbuf, 1).at[0].set(fn), fbuf)
        carry = (
            keep(xn, x), keep(gn, g), keep(fn, f), keep(alpha_n, alpha),
            fbuf, jnp.logical_or(done, newly), n_done + active.astype(jnp.int32),
        )
        return carry, None

    if x0 is None:
        x0 = jnp.zeros_like(b)
    x0 = project_l1_ball(x0, tau)
    f0, g0, r0 = f_and_g(x0)
    fbuf0 = jnp.full((history,), f0, dtype)
    alpha0 = 1.0 / jnp.maximum(jnp.max(jnp.abs(g0)), 1e-12)
    init = (x0, g0, f0, alpha0, fbuf0, jnp.array(False), jnp.zeros((), jnp.int32))
    (x, g, f, _, _, _, n), _ = jax.jit(
        lambda i: jax.lax.scan(body, i, None, length=max_iter)
    )(init)
    resid = jnp.sqrt(2.0 * f)
    return x, resid, g, int(n)


def spgl1_bpdn(
    b: jnp.ndarray,
    H,
    blur: BlurOperator,
    sigma: float,
    max_newton: int = 10,
    inner_iter: int = 150,
    tol: float = 1e-3,
) -> SPGL1Result:
    """Basis pursuit denoise via Pareto-curve Newton iteration over tau."""
    A, At, _ = _make_ops(H, blur)
    tau = 0.0
    x = jnp.zeros_like(jnp.asarray(b, blur.dtype))
    resid = float(jnp.linalg.norm(b))
    n_total = 0
    n_newton = 0
    for _ in range(max_newton):
        if resid <= sigma * (1.0 + tol):
            break
        g_inf = float(jnp.max(jnp.abs(At(A(x) - jnp.asarray(b, blur.dtype)))))
        g_inf = max(g_inf, 1e-12)
        tau = tau + resid * (resid - sigma) / g_inf
        x, r, _, n = spg_lasso(b, H, blur, tau, x0=x, max_iter=inner_iter)
        resid = float(r)
        n_total += n
        n_newton += 1
    return SPGL1Result(
        x=np.asarray(x), tau=float(tau), resid_norm=resid,
        n_iters=n_total, n_newton=n_newton,
    )
