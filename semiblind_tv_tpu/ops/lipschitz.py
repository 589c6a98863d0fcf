"""Operator-norm estimation for the blur operator A^T A.

The reference runs a power iteration with a random start
(`utils/max_eigenval_Gaussian_Moffat.m:1-27`, `utils/max_eigenval_Laplace.m`):
x ← A^T(A(x)); val = ||x||; stop when the relative change < tol.

For an FFT-diagonal operator the limit is available in closed form:
λ_max(A^T A) = max |H|².  We provide both — the closed form is what the
framework uses (exact, free), the power iteration exists for parity testing
and for operators without a known diagonalisation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["power_iteration", "max_eigenval_closed_form"]


def max_eigenval_closed_form(H: jnp.ndarray) -> jnp.ndarray:
    """λ_max(A^T A) = max |H|² for the rfft-diagonal blur operator."""
    re, im = H.real, H.imag
    return jnp.max(re * re + im * im)


@partial(jax.jit, static_argnames=("apply_AtA", "max_iter", "shape"))
def power_iteration(
    apply_AtA,
    key,
    shape,
    tol: float = 1e-4,
    max_iter: int = 10_000,
):
    """Power method for λ_max(A^T A) (parity with max_eigenval_*.m).

    apply_AtA: callable x -> A^T(A(x)).
    Early exit expressed as a masked while_loop, like the reference's break.
    """
    x0 = jax.random.normal(key, shape)
    x0 = x0 / jnp.linalg.norm(x0)

    def cond(carry):
        _, _, rel, k = carry
        return jnp.logical_and(k < max_iter, rel >= tol)

    def body(carry):
        x, val_prev, _, k = carry
        x = apply_AtA(x)
        val = jnp.linalg.norm(x)
        rel = jnp.abs(val - val_prev) / val_prev
        x = x / val
        return x, val, rel, k + 1

    init = (x0, jnp.ones((), x0.dtype), jnp.array(jnp.inf, x0.dtype), 0)
    _, val, _, iters = jax.lax.while_loop(cond, body, init)
    return val, iters
