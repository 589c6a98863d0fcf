"""C-SALSA — constrained SALSA:  min φ(x)  s.t.  ‖Ax − y‖₂ ≤ ε.

Re-design of the reference `SALSA/CSALSA_v2.m:160-561` for the
rfft-diagonal blur operator.  Per outer iteration (CSALSA_v2.m:462-518):

    r  = µ1 (u + bu) + µ2 Aᵀ(y + v + bv)
    x  = (µ2 AᵀA + µ1 I)⁻¹ r                rfft-diagonal inverse
    u  = prox_{TV/µ1}(x − bu)               Chambolle, warm-started duals
    ve = Ax − y − bv;  v = ve·min(1, ε/‖ve‖)   (ε-ball projection, :483-489)
    bv ← bv − (Ax − y − v);  bu ← bu − (x − u)
    µ1 ← δ·µ1, µ2 ← δ·µ2                    (continuation, :517-518)
    stop: rel-Δ criterion < tol  AND  ‖Ax − y‖ ≤ ε      (:520-545)

Default ε = sqrt(d + 8√d)·σ (CSALSA_v2.m:412-413).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu.ops.fourier import BlurOperator
from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm

__all__ = ["CSALSAResult", "csalsa_tv"]


@dataclasses.dataclass
class CSALSAResult:
    x: np.ndarray
    objective: np.ndarray      # φ(x) per iteration
    criterion: np.ndarray      # ‖Ax − y‖ per iteration
    mses: np.ndarray
    n_iters: int


def csalsa_tv(
    y: jnp.ndarray,
    H,
    mu1: float,
    mu2: float,
    blur: BlurOperator,
    sigma: Optional[float] = None,
    epsilon: Optional[float] = None,
    delta: float = 1.0,
    max_iter: int = 200,
    tol: float = 1e-4,
    stop_criterion: int = 1,
    tv_iters: int = 10,
    x_true=None,
    use_pallas: bool = False,
) -> CSALSAResult:
    dtype = blur.dtype
    y = jnp.asarray(y, dtype)
    d = y.size
    w = blur.weights

    H = np.asarray(H)  # host complex (TPU: no complex D2H)
    yhat = blur.rfft_host(y)
    absH2 = H.real**2 + H.imag**2

    if epsilon is None:
        if sigma is None:
            raise ValueError("provide epsilon or sigma")
        epsilon = float(np.sqrt(d + 8.0 * np.sqrt(d)) * sigma)

    compute_mse = x_true is not None
    x_true_arr = jnp.asarray(x_true, dtype) if compute_mse else None

    def pnorm2(rhat):
        re, im = rhat.real, rhat.imag
        return jnp.sum(w * (re * re + im * im)) / d

    def body(carry, k):
        x, u, bu, v, bv, pux, puy, m1, m2, prev_obj, prev_crit, done, n_done = carry
        active = jnp.logical_not(done)

        # Aᵀ(y + v + bv) and the LS solve, fused on the rfft grid
        rhs_hat = blur.rfft(m1 * (u + bu)) + m2 * jnp.conj(H) * (
            jnp.asarray(yhat) + blur.rfft(v + bv)
        )
        xhat = rhs_hat / (m2 * absH2 + m1)
        xn = blur.irfft(xhat)

        un, st = chambolle_prox(
            xn - bu, 1.0 / m1, tv_iters, duals=(pux, puy), use_pallas=use_pallas
        )

        Ax = blur.irfft(H * xhat)
        ve = Ax - y - bv
        n_ve = jnp.linalg.norm(ve)
        vn = jnp.where(n_ve <= epsilon, ve, ve / n_ve * epsilon)

        bvn = bv - (Ax - y - vn)
        bun = bu - (xn - un)

        crit = jnp.sqrt(pnorm2(H * xhat - jnp.asarray(yhat)))
        obj = tv_norm(xn)

        if stop_criterion == 1:
            sc = jnp.abs(obj - prev_obj) / obj
        elif stop_criterion == 2:
            sc = jnp.linalg.norm(xn - x) / jnp.linalg.norm(xn)
        else:
            sc = jnp.abs(crit - prev_crit) / crit
        newly = jnp.logical_and(
            jnp.logical_and(jnp.logical_and(sc < tol, crit <= epsilon), k >= 1),
            active,
        )

        keep = lambda a, b: jnp.where(active, a, b)
        x, u, bu, v, bv = keep(xn, x), keep(un, u), keep(bun, bu), keep(vn, v), keep(bvn, bv)
        pux, puy = keep(st.px, pux), keep(st.py, puy)
        m1 = jnp.where(active, m1 * delta, m1)
        m2 = jnp.where(active, m2 * delta, m2)
        obj_out = jnp.where(active, obj, prev_obj)
        crit_out = jnp.where(active, crit, prev_crit)
        n_done = n_done + active.astype(jnp.int32)
        done = jnp.logical_or(done, newly)
        mse = (
            jnp.sum((x - x_true_arr) ** 2) / d if compute_mse else jnp.zeros((), dtype)
        )
        trace = dict(objective=obj_out, criterion=crit_out, mse=mse)
        return (x, u, bu, v, bv, pux, puy, m1, m2, obj_out, crit_out, done, n_done), trace

    z = jnp.zeros_like(y)
    init = (
        z, z, z, z, z, z, z,
        jnp.asarray(mu1, dtype), jnp.asarray(mu2, dtype),
        tv_norm(z), jnp.linalg.norm(y),
        jnp.array(False), jnp.zeros((), jnp.int32),
    )
    (x, *_, n_done), traces = jax.jit(
        lambda i: jax.lax.scan(body, i, jnp.arange(max_iter))
    )(init)

    traces = jax.tree_util.tree_map(np.asarray, traces)
    return CSALSAResult(
        x=np.asarray(x),
        objective=traces["objective"],
        criterion=traces["criterion"],
        mses=traces["mse"],
        n_iters=int(n_done),
    )
