"""Fused Pallas kernel for the spatial segment of the SAPG step.

Between the two FFTs of a SAPG iteration, everything is elementwise or a
stencil over the same (M, N) fields:

    Xn    = [abs](X + γ(prox−X)/λ − γ·gradF + √(2γ)·Z)        MYULA update
    proxn = chambolle(Xn, λθ, n_sweeps)                        TV prox
    tv    = Σ √((Xn − roll₁Xn)² + (Xn − roll₀Xn)²)             TV norm

As separate XLA ops each stage round-trips its fields through HBM; this
kernel keeps X/Z/gradF/duals resident in VMEM for the whole segment
(≈7 f32 fields at 512² ≈ 7 MB, within the ~16 MB/core budget) and emits
(Xn, proxn, tv) in one launch.  Numerics are identical to the unfused path
(ops/tv.py semantics: Neumann stencils, τ=0.249, masked early exit on the
pre-update fixed-point residual; circular-difference TV norm).

Chain batching is native: (B, M, N) inputs run as a grid of B programs
(one chain per program) — do NOT vmap the pallas_call.  All scalars
(γ, λ, λθ, τ, tol) ride in SMEM so they may be traced values.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semiblind_tv_tpu.ops.tv_pallas import chunked_chain_call

__all__ = ["myula_prox_tv", "myula_prox_tv_dft", "myula_prox_tv_irdft"]


def _kernel(x_ref, prox_ref, grad_ref, z_ref, scal_ref,
            xn_ref, proxn_ref, tv_ref,
            *, n_sweeps: int, positivity: bool):
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]

    x = x_ref[0]
    M, N = x.shape
    zrow = jnp.zeros((1, N), x.dtype)
    zcol = jnp.zeros((M, 1), x.dtype)

    # ---- MYULA update -----------------------------------------------------
    xn = (
        x
        + gamma * (prox_ref[0] - x) / lam
        - gamma * grad_ref[0]
        + jnp.sqrt(2.0 * gamma) * z_ref[0]
    )
    if positivity:
        xn = jnp.abs(xn)
    xn_ref[0] = xn

    # ---- Chambolle dual ascent (fresh duals, as the SAPG prox uses) -------
    glam = xn / lam_theta

    def div(p1, p2):
        u = jnp.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
        v = jnp.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
        return u + v

    def body(_, carry):
        px, py, active = carry
        u = div(px, py) - glam
        upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow], axis=0)
        upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol], axis=1)
        tmp = jnp.sqrt(upx * upx + upy * upy)
        rx = -upx + tmp * px
        ry = -upy + tmp * py
        step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
        denom = 1.0 + tau * tmp
        px = jnp.where(active, (px + tau * upx) / denom, px)
        py = jnp.where(active, (py + tau * upy) / denom, py)
        active = jnp.logical_and(active, step_err > tol)
        return px, py, active

    px0 = jnp.zeros_like(x)
    px, py, _ = jax.lax.fori_loop(0, n_sweeps, body, (px0, px0, jnp.array(True)))
    proxn_ref[0] = xn - lam_theta * div(px, py)

    # ---- circular-difference TV norm --------------------------------------
    # circular shift-by-1 as concatenates (portable across Mosaic and
    # interpret mode, unlike pltpu.roll)
    dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
    dv = xn - jnp.concatenate([xn[-1:, :], xn[:-1, :]], axis=0)
    # whole-array SMEM output, one row per sequential grid program
    tv_ref[pl.program_id(0)] = jnp.sum(jnp.sqrt(dh * dh + dv * dv))


def _kernel_dft(ghat_re_ref, ghat_im_ref, x_ref, prox_ref, z_ref,
                cm_ref, sm_ref, wct_ref, wst_ref, cn_ref, sn_ref,
                scal_ref,
                xn_ref, proxn_ref, tv_ref, xhre_ref, xhim_ref,
                *, n_sweeps: int, positivity: bool, precision):
    """Whole-iteration kernel: irfft2(Ghat)/σ² + MYULA + Chambolle prox +
    TV norm + rfft2(Xn), all VMEM-resident, DFTs as in-kernel MXU matmuls
    (same math as ops/fourier.rfft2_matmul/irfft2_matmul)."""
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]
    sigma2 = scal_ref[5]

    x = x_ref[0]
    M, N = x.shape
    zrow = jnp.zeros((1, N), x.dtype)
    zcol = jnp.zeros((M, 1), x.dtype)
    def mm(a, b):
        return jnp.dot(a, b, precision=precision, preferred_element_type=x.dtype)

    # ---- gradF = irfft2(Ghat)/σ² : inverse columns then hermitian rows ----
    cm, sm = cm_ref[...], sm_ref[...]
    zre, zim = ghat_re_ref[0], ghat_im_ref[0]
    inv_m = 1.0 / M
    yre = (mm(cm, zre) - mm(sm, zim)) * inv_m
    yim = (mm(cm, zim) + mm(sm, zre)) * inv_m
    grad = (mm(yre, wct_ref[...]) - mm(yim, wst_ref[...])) / sigma2

    # ---- MYULA update -----------------------------------------------------
    xn = (
        x
        + gamma * (prox_ref[0] - x) / lam
        - gamma * grad
        + jnp.sqrt(2.0 * gamma) * z_ref[0]
    )
    if positivity:
        xn = jnp.abs(xn)
    xn_ref[0] = xn

    # ---- Chambolle dual ascent (fresh duals, as the SAPG prox uses) -------
    glam = xn / lam_theta

    def div(p1, p2):
        u = jnp.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
        v = jnp.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
        return u + v

    def body(_, carry):
        px, py, active = carry
        u = div(px, py) - glam
        upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow], axis=0)
        upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol], axis=1)
        tmp = jnp.sqrt(upx * upx + upy * upy)
        rx = -upx + tmp * px
        ry = -upy + tmp * py
        step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
        denom = 1.0 + tau * tmp
        px = jnp.where(active, (px + tau * upx) / denom, px)
        py = jnp.where(active, (py + tau * upy) / denom, py)
        active = jnp.logical_and(active, step_err > tol)
        return px, py, active

    px0 = jnp.zeros_like(x)
    px, py, _ = jax.lax.fori_loop(0, n_sweeps, body, (px0, px0, jnp.array(True)))
    proxn_ref[0] = xn - lam_theta * div(px, py)

    # ---- circular-difference TV norm --------------------------------------
    dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
    dv = xn - jnp.concatenate([xn[-1:, :], xn[:-1, :]], axis=0)
    tv_ref[pl.program_id(0)] = jnp.sum(jnp.sqrt(dh * dh + dv * dv))

    # ---- Xhatn = rfft2(xn): forward rows then symmetric columns -----------
    fre = mm(xn, cn_ref[...])
    fim = -mm(xn, sn_ref[...])
    xhre_ref[0] = mm(cm, fre) + mm(sm, fim)
    xhim_ref[0] = mm(cm, fim) - mm(sm, fre)


@partial(jax.jit, static_argnames=("n_sweeps", "positivity", "interpret", "precision"))
def myula_prox_tv_dft(
    ghat: jnp.ndarray,
    x: jnp.ndarray,
    prox_cache: jnp.ndarray,
    z: jnp.ndarray,
    rdft_mats,
    gamma,
    lam,
    lam_theta,
    sigma2,
    n_sweeps: int = 25,
    tau: float = 0.249,
    tol: float = 1e-3,
    positivity: bool = True,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One launch per SAPG iteration: returns (x_new, prox_new, tv, xhat_new).

    ghat is the half-spectrum conj(H)·(H·Xhat − yhat) (pre-σ² division);
    rdft_mats is fourier.rdft_matrices(shape) — the six real DFT factor
    matrices ride into VMEM once and serve both the inverse and forward
    transform as MXU matmuls, eliminating the two XLA transform dispatches
    and the gradF/Xn HBM round-trips between them.  (B, M, N) inputs run one
    grid program per chain; xhat_new is returned as a complex array.
    """
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "myula_prox_tv_dft requires a TPU backend (Mosaic kernel); on "
            f"{jax.default_backend()!r} use the unfused path or interpret=True"
        )
    # Mosaic only lowers DEFAULT and HIGHEST dot precisions; HIGH (the TPU
    # hot-loop auto for the XLA transform path) coerces to HIGHEST here
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST
    squeeze = x.ndim == 2
    if squeeze:
        ghat, x, prox_cache, z = ghat[None], x[None], prox_cache[None], z[None]
    B, M, N = x.shape
    Nh = N // 2 + 1
    scal = jnp.stack(
        [jnp.asarray(gamma, x.dtype), jnp.asarray(lam, x.dtype),
         jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype), jnp.asarray(sigma2, x.dtype)]
    )
    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    half_spec = lambda: pl.BlockSpec((1, M, Nh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # one shared full block for every grid program
    mat_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    mats = [jnp.asarray(rdft_mats[k], x.dtype) for k in ("CM", "SM", "WCT", "WST", "CN", "SN")]

    def run(ghre, ghim, xc, proxc, zc):
        Bc = xc.shape[0]
        return pl.pallas_call(
            partial(_kernel_dft, n_sweeps=n_sweeps, positivity=bool(positivity),
                    precision=precision),
            grid=(Bc,),
            out_shape=(
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct((Bc,), xc.dtype),
                jax.ShapeDtypeStruct((Bc, M, Nh), xc.dtype),
                jax.ShapeDtypeStruct((Bc, M, Nh), xc.dtype),
            ),
            in_specs=[half_spec(), half_spec(), img_spec(), img_spec(), img_spec()]
            + [mat_spec(m) for m in mats]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                img_spec(),
                img_spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                half_spec(),
                half_spec(),
            ),
            interpret=interpret,
        )(ghre, ghim, xc, proxc, zc, *mats, scal)

    xn, proxn, tv, xhre, xhim = chunked_chain_call(
        run, (ghat.real, ghat.imag, x, prox_cache, z)
    )
    xhat = jax.lax.complex(xhre, xhim)
    if squeeze:
        xn, proxn, tv, xhat = xn[0], proxn[0], tv[0], xhat[0]
    return xn, proxn, tv, xhat


@partial(jax.jit, static_argnames=("n_sweeps", "positivity", "interpret"))
def myula_prox_tv(
    x: jnp.ndarray,
    prox_cache: jnp.ndarray,
    grad_f: jnp.ndarray,
    z: jnp.ndarray,
    gamma,
    lam,
    lam_theta,
    n_sweeps: int = 25,
    tau: float = 0.249,
    tol: float = 1e-3,
    positivity: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (x_new, prox_new, tv(x_new)) in one fused TPU kernel.

    Accepts (M, N) single-chain or (B, M, N) chain-batched fields; batched
    inputs run one program per chain (tv is then shape (B,))."""
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "use_fused_step requires a TPU backend (Mosaic kernel); on "
            f"{jax.default_backend()!r} use the default unfused path or "
            "interpret=True"
        )
    squeeze = x.ndim == 2
    if squeeze:
        x, prox_cache, grad_f, z = x[None], prox_cache[None], grad_f[None], z[None]
    B, M, N = x.shape
    scal = jnp.stack(
        [jnp.asarray(gamma, x.dtype), jnp.asarray(lam, x.dtype),
         jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype)]
    )
    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(xc, proxc, gradc, zc):
        Bc = xc.shape[0]
        return pl.pallas_call(
            partial(_kernel, n_sweeps=n_sweeps, positivity=bool(positivity)),
            grid=(Bc,),
            out_shape=(
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct((Bc,), xc.dtype),
            ),
            in_specs=[
                img_spec(),
                img_spec(),
                img_spec(),
                img_spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                img_spec(),
                img_spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(xc, proxc, gradc, zc, scal)

    xn, proxn, tv = chunked_chain_call(run, (x, prox_cache, grad_f, z))
    if squeeze:
        xn, proxn, tv = xn[0], proxn[0], tv[0]
    return xn, proxn, tv


def _kernel_irdft(ghat_re_ref, ghat_im_ref, x_ref, prox_ref, z_ref,
                  cm_ref, sm_ref, wct_ref, wst_ref,
                  scal_ref,
                  xn_ref, proxn_ref, tv_ref,
                  *, n_sweeps: int, positivity: bool, precision):
    """Two-region split of the whole-iteration kernel for 512²: fuses ONLY
    the inverse transform (irfft2(Ghat)/σ²) into the spatial segment — the
    forward rfft2 of Xn stays in XLA.  Dropping the CN/SN factor matrices
    and the two half-spectrum outputs is what brings the footprint back
    under the 16 MB scoped-VMEM limit where the full one-kernel fails."""
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]
    sigma2 = scal_ref[5]

    x = x_ref[0]
    M, N = x.shape
    zrow = jnp.zeros((1, N), x.dtype)
    zcol = jnp.zeros((M, 1), x.dtype)

    def mm(a, b):
        return jnp.dot(a, b, precision=precision, preferred_element_type=x.dtype)

    cm, sm = cm_ref[...], sm_ref[...]
    zre, zim = ghat_re_ref[0], ghat_im_ref[0]
    inv_m = 1.0 / M
    yre = (mm(cm, zre) - mm(sm, zim)) * inv_m
    yim = (mm(cm, zim) + mm(sm, zre)) * inv_m
    grad = (mm(yre, wct_ref[...]) - mm(yim, wst_ref[...])) / sigma2

    xn = (
        x
        + gamma * (prox_ref[0] - x) / lam
        - gamma * grad
        + jnp.sqrt(2.0 * gamma) * z_ref[0]
    )
    if positivity:
        xn = jnp.abs(xn)
    xn_ref[0] = xn

    glam = xn / lam_theta

    def div(p1, p2):
        u = jnp.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
        v = jnp.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
        return u + v

    def body(_, carry):
        px, py, active = carry
        u = div(px, py) - glam
        upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow], axis=0)
        upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol], axis=1)
        tmp = jnp.sqrt(upx * upx + upy * upy)
        rx = -upx + tmp * px
        ry = -upy + tmp * py
        step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
        denom = 1.0 + tau * tmp
        px = jnp.where(active, (px + tau * upx) / denom, px)
        py = jnp.where(active, (py + tau * upy) / denom, py)
        active = jnp.logical_and(active, step_err > tol)
        return px, py, active

    px0 = jnp.zeros_like(x)
    px, py, _ = jax.lax.fori_loop(0, n_sweeps, body, (px0, px0, jnp.array(True)))
    proxn_ref[0] = xn - lam_theta * div(px, py)

    dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
    dv = xn - jnp.concatenate([xn[-1:, :], xn[:-1, :]], axis=0)
    tv_ref[pl.program_id(0)] = jnp.sum(jnp.sqrt(dh * dh + dv * dv))


@partial(jax.jit, static_argnames=("n_sweeps", "positivity", "interpret", "precision"))
def myula_prox_tv_irdft(
    ghat: jnp.ndarray,
    x: jnp.ndarray,
    prox_cache: jnp.ndarray,
    z: jnp.ndarray,
    rdft_mats,
    gamma,
    lam,
    lam_theta,
    sigma2,
    n_sweeps: int = 25,
    tau: float = 0.249,
    tol: float = 1e-3,
    positivity: bool = True,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """irfft∘gradF + MYULA + prox + TV in one launch (forward rfft2 of the
    result stays outside); returns (x_new, prox_new, tv)."""
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "myula_prox_tv_irdft requires a TPU backend; use interpret=True on CPU"
        )
    squeeze = x.ndim == 2
    if squeeze:
        ghat, x, prox_cache, z = ghat[None], x[None], prox_cache[None], z[None]
    B, M, N = x.shape
    Nh = N // 2 + 1
    scal = jnp.stack(
        [jnp.asarray(gamma, x.dtype), jnp.asarray(lam, x.dtype),
         jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype), jnp.asarray(sigma2, x.dtype)]
    )
    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    half_spec = lambda: pl.BlockSpec((1, M, Nh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mat_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    mats = [jnp.asarray(rdft_mats[k], x.dtype) for k in ("CM", "SM", "WCT", "WST")]

    def run(ghre, ghim, xc, proxc, zc):
        Bc = xc.shape[0]
        return pl.pallas_call(
            partial(_kernel_irdft, n_sweeps=n_sweeps, positivity=bool(positivity),
                    precision=precision),
            grid=(Bc,),
            out_shape=(
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                jax.ShapeDtypeStruct((Bc,), xc.dtype),
            ),
            in_specs=[half_spec(), half_spec(), img_spec(), img_spec(), img_spec()]
            + [mat_spec(m) for m in mats]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                img_spec(),
                img_spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(ghre, ghim, xc, proxc, zc, *mats, scal)

    xn, proxn, tv = chunked_chain_call(run, (ghat.real, ghat.imag, x, prox_cache, z))
    if squeeze:
        xn, proxn, tv = xn[0], proxn[0], tv[0]
    return xn, proxn, tv
