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
(ops/tv.py semantics: Neumann stencils, τ=0.249, early exit on the
pre-update fixed-point residual via the shared tv_pallas.dual_ascent_loop;
circular-difference TV norm).

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

from semiblind_tv_tpu.ops.tv_pallas import (
    chunked_chain_call, dual_ascent_loop, neumann_div,
    streamed_call, streamed_tile_rows,
    tiled_divergence, tiled_sweep_phase,
)

__all__ = [
    "myula_prox_tv", "myula_prox_tv_dft", "myula_prox_tv_irdft",
    "myula_prox_tv_rng", "myula_prox_tv_streamed", "myula_prox_tv_tiled",
]


def _kernel(x_ref, prox_ref, grad_ref, z_ref, scal_ref,
            xn_ref, proxn_ref, tv_ref,
            *, n_sweeps: int, positivity: bool):
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]

    x = x_ref[0]

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
    px0 = jnp.zeros_like(x)
    px, py, _, _ = dual_ascent_loop(xn / lam_theta, tau, tol, n_sweeps, px0, px0)
    proxn_ref[0] = xn - lam_theta * neumann_div(px, py)

    # ---- circular-difference TV norm --------------------------------------
    # circular shift-by-1 as concatenates (portable across Mosaic and
    # interpret mode, unlike pltpu.roll)
    dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
    dv = xn - jnp.concatenate([xn[-1:, :], xn[:-1, :]], axis=0)
    # whole-array SMEM output, one row per sequential grid program
    tv_ref[pl.program_id(0)] = jnp.sum(jnp.sqrt(dh * dh + dv * dv))


from semiblind_tv_tpu.ops.tv_pallas import box_muller_normals as _box_muller_normals


def _kernel_rng(x_ref, prox_ref, grad_ref, seed_ref, scal_ref,
                xn_ref, proxn_ref, tv_ref,
                *, n_sweeps: int, positivity: bool):
    """myula_prox_tv with the Langevin noise generated IN the kernel (the
    hardware per-core PRNG) instead of streamed from HBM — drops the Z field's
    HBM write+read (2·M·N·4 bytes/chain-iter) and its XLA threefry dispatch."""
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]

    x = x_ref[0]
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[b, 0], seed_ref[b, 1])
    z = _box_muller_normals(x.shape, x.dtype)

    xn = (
        x
        + gamma * (prox_ref[0] - x) / lam
        - gamma * grad_ref[0]
        + jnp.sqrt(2.0 * gamma) * z
    )
    if positivity:
        xn = jnp.abs(xn)
    xn_ref[0] = xn

    px0 = jnp.zeros_like(x)
    px, py, _, _ = dual_ascent_loop(xn / lam_theta, tau, tol, n_sweeps, px0, px0)
    proxn_ref[0] = xn - lam_theta * neumann_div(px, py)

    dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
    dv = xn - jnp.concatenate([xn[-1:, :], xn[:-1, :]], axis=0)
    tv_ref[pl.program_id(0)] = jnp.sum(jnp.sqrt(dh * dh + dv * dv))


@partial(jax.jit, static_argnames=("n_sweeps", "positivity"))
def myula_prox_tv_rng(
    x: jnp.ndarray,
    prox_cache: jnp.ndarray,
    grad_f: jnp.ndarray,
    seeds: jnp.ndarray,
    gamma,
    lam,
    lam_theta,
    n_sweeps: int = 25,
    tau: float = 0.249,
    tol: float = 1e-3,
    positivity: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """myula_prox_tv variant with IN-KERNEL noise generation (EXTENSION,
    opt-in via SAPGConfig.in_kernel_rng — not reference behavior).

    `seeds` is (B, 2) int32 (or (2,) for a single chain): per-chain,
    per-iteration hardware-PRNG seeds — the caller derives them from its
    split threefry key stream (estimator.chain_seeds), so determinism and
    per-chain layout invariance are preserved, but the normal draw itself is
    an in-kernel Box–Muller over pltpu.prng_random_bits rather than the host
    threefry stream: a DIFFERENT (equally valid) noise realization, so
    trajectories are not comparable sample-for-sample with the default path.

    TPU-only: pltpu.prng_seed has no CPU/interpret lowering, so there is no
    interpret= escape hatch here; the estimator auto-gates the option to TPU
    backends (tested statistically in tests/test_tpu_only.py)."""
    if jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "in-kernel RNG requires a TPU backend (pltpu.prng_seed has no "
            f"CPU lowering); on {jax.default_backend()!r} use the default path"
        )
    squeeze = x.ndim == 2
    if squeeze:
        x, prox_cache, grad_f, seeds = x[None], prox_cache[None], grad_f[None], seeds[None]
    B, M, N = x.shape
    assert seeds.shape == (B, 2), seeds.shape
    scal = jnp.stack(
        [jnp.asarray(gamma, x.dtype), jnp.asarray(lam, x.dtype),
         jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype)]
    )
    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(xc, proxc, gradc, seedc):
        Bc = xc.shape[0]
        return pl.pallas_call(
            partial(_kernel_rng, n_sweeps=n_sweeps, positivity=bool(positivity)),
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                img_spec(),
                img_spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(xc, proxc, gradc, seedc, scal)

    xn, proxn, tv = chunked_chain_call(run, (x, prox_cache, grad_f, seeds))
    if squeeze:
        xn, proxn, tv = xn[0], proxn[0], tv[0]
    return xn, proxn, tv


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
    px0 = jnp.zeros_like(x)
    px, py, _, _ = dual_ascent_loop(xn / lam_theta, tau, tol, n_sweeps, px0, px0)
    proxn_ref[0] = xn - lam_theta * neumann_div(px, py)

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
    M = x.shape[0]

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

    px0 = jnp.zeros_like(x)
    px, py, _, _ = dual_ascent_loop(xn / lam_theta, tau, tol, n_sweeps, px0, px0)
    proxn_ref[0] = xn - lam_theta * neumann_div(px, py)

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


# ---------------------------------------------------------------------------
# HBM-streamed fused step for images beyond the tiled kernel's scratch cap
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_sweeps", "positivity", "tile_rows",
                                   "interpret", "pipelined"))
def myula_prox_tv_streamed(
    x: jnp.ndarray,
    prox_cache: jnp.ndarray,
    grad_f: jnp.ndarray,
    z: jnp.ndarray,
    gamma,
    lam,
    lam_theta,
    sigma2=1.0,
    n_sweeps: int = 25,
    tau: float = 0.249,
    tol: float = 1e-3,
    positivity: bool = True,
    tile_rows: int | None = None,
    interpret: bool = False,
    pipelined: bool = True,
    seeds: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """HBM-streamed fused MYULA + Chambolle prox + TV norm for images whose
    whole-image dual fields exceed VMEM scratch (>= 2048² f32 — beyond
    myula_prox_tv_tiled's cap): the spatial segment of the SAPG iteration
    (reference hot loop SAPG/SAPG_algorithm_Guassian.m:158-194) runs as ONE
    launch.  A prologue streams x/prox/gradF/Z once in row tiles, computes
    xn = [abs](x + γ(prox−x)/λ − γ·gradF/σ² + √(2γ)Z) and the
    circular-difference TV norm, and writes xn to the HBM workspace that
    the temporally-blocked dual-ascent passes then consume as g
    (ops/tv_pallas._streamed_kernel mode="fused"; first pass holds the
    fresh zero duals in-register).  Returns (x_new, prox_new, tv) —
    semantics identical to the unfused composition (myula_kernel_step with
    gradF = grad_f/σ², chambolle_prox, tv_norm); bit-identity of the
    fields is TPU-tested at 2048².

    seeds: optional (B, 2) int32 per-chain hardware-PRNG seeds (EXTENSION,
    opt-in via SAPGConfig.in_kernel_rng, mirroring myula_prox_tv_rng at
    this size): the Langevin noise is generated IN the prologue by the
    seeded per-core PRNG (paired Box-Muller, fixed tile order) instead of
    streaming `z` from HBM — pass z=None then.  TPU-only (pltpu.prng_seed
    has no CPU/interpret lowering) and a different (equally valid) noise
    realization than the threefry default.

    Accepts (M, N) or (B, M, N); chains run sequentially in the grid,
    sharing the HBM dual workspaces."""
    ikr = seeds is not None
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "myula_prox_tv_streamed requires a TPU backend; use "
            "interpret=True on CPU"
        )
    if ikr and interpret:
        raise NotImplementedError(
            "in-kernel RNG has no interpret lowering (pltpu.prng_seed)"
        )
    squeeze = x.ndim == 2
    if squeeze:
        x, prox_cache, grad_f = x[None], prox_cache[None], grad_f[None]
        if ikr:
            seeds = seeds[None]
        else:
            z = z[None]
    B, M, N = x.shape
    if ikr:
        assert seeds.shape == (B, 2), seeds.shape
    if tile_rows is None:
        itemsize = jnp.dtype(x.dtype).itemsize
        try:
            tile_rows = streamed_tile_rows(
                M, N, itemsize, pipelined=pipelined, fused=True
            )
        except ValueError:
            if not pipelined:
                raise
            # the single-slot form frees ~half the buffer rows — the
            # largest geometries (4096²+) only fit there
            pipelined = False
            tile_rows = streamed_tile_rows(
                M, N, itemsize, pipelined=False, fused=True
            )
    scal = jnp.stack(
        [jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype), jnp.asarray(gamma, x.dtype),
         jnp.asarray(lam, x.dtype), jnp.asarray(sigma2, x.dtype)]
    )
    last = jnp.asarray(seeds, jnp.int32) if ikr else z
    xn, f, _pxyA, _pxyB, tv, _meta = streamed_call(
        (x, prox_cache, grad_f, last, scal), x,
        mode="fused", ret_duals=False, max_iter=n_sweeps,
        tile_rows=tile_rows, pipelined=pipelined, interpret=interpret,
        positivity=bool(positivity), in_kernel_rng=ikr,
    )
    if squeeze:
        xn, f, tv = xn[0], f[0], tv[0]
    return xn, f, tv


# ---------------------------------------------------------------------------
# Row-tiled fused step for images too large for whole-image VMEM residency
# ---------------------------------------------------------------------------

def _tiled_fused_kernel(x_ref, prox_ref, grad_ref, z_ref, scal_ref,
                        xn_ref, f_ref, tv_ref, meta_ref,
                        xn_s, px_s, py_s, stash, smem, tvacc,
                        *, n_sweeps: int, tile_rows: int, n_tiles: int,
                        positivity: bool):
    """Grid (B, n_sweeps + 2, T), T fastest, chains outermost.  Phase s=0
    computes the MYULA update per tile (streaming x/prox/gradF/Z from HBM
    once) into the whole-image xn scratch and zeroes the dual scratch;
    phases 1..n_sweeps are Jacobi dual-ascent sweeps entirely out of VMEM
    scratch (ZERO per-sweep HBM traffic — the prox-only tiled kernel streams
    g every sweep); the final phase assembles proxn from the converged duals
    and accumulates the circular-difference TV norm of xn.  Input/output
    index maps are gated on s so tiles stream only in the phase that uses
    them (equal consecutive block indices → Mosaic skips the copy)."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    t = pl.program_id(2)
    R = tile_rows
    gamma = scal_ref[0]
    lam = scal_ref[1]
    lam_theta = scal_ref[2]
    tau = scal_ref[3]
    tol = scal_ref[4]
    x = x_ref[0]
    N = x.shape[1]
    dtype = x.dtype
    is_first = t == 0
    is_last = t == n_tiles - 1
    last_tile = (n_tiles - 1) * R

    @pl.when(jnp.logical_and(s == 0, t == 0))
    def _init_smem():
        smem[0] = 0.0          # err accumulator
        smem[1] = 0.0          # iteration count k
        smem[2] = jnp.inf      # last fixed-point residual
        smem[3] = 1.0          # active flag
        tvacc[0] = jnp.zeros((), dtype)

    @pl.when(s == 0)
    def _myula():
        xn = (
            x
            + gamma * (prox_ref[0] - x) / lam
            - gamma * grad_ref[0]
            + jnp.sqrt(2.0 * gamma) * z_ref[0]
        )
        if positivity:
            xn = jnp.abs(xn)
        xn_s[pl.ds(t * R, R)] = xn
        xn_ref[0] = xn
        px_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
        py_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
        f_ref[0] = xn  # placeholder; f's block is pinned until assembly

    @pl.when(jnp.logical_and(s >= 1, s <= n_sweeps))
    def _sweep():
        glam = xn_s[pl.ds(t * R, R)] / lam_theta
        nxt = jnp.minimum((t + 1) * R, last_tile)
        tiled_sweep_phase(
            px_s, py_s, stash, smem, glam, xn_s[pl.ds(nxt, 1)] / lam_theta, t,
            tile_rows=R, n_tiles=n_tiles, tau=tau, tol=tol,
        )
        # keep the pinned revisited output blocks defined (interpret mode
        # writes them back every step; Mosaic skips the copies)
        xn_ref[0] = xn_s[pl.ds(last_tile, R)]
        f_ref[0] = px_s[pl.ds(t * R, R)]

    @pl.when(s == n_sweeps + 1)
    def _assemble():
        xn_t = xn_s[pl.ds(t * R, R)]
        f_ref[0] = xn_t - lam_theta * tiled_divergence(
            px_s, py_s, t, tile_rows=R, n_tiles=n_tiles
        )
        xn_ref[0] = xn_s[pl.ds(last_tile, R)]  # pinned placeholder

        # circular-difference TV norm of xn: columns wrap within the tile,
        # rows wrap globally (tile 0's row above is the image's last row)
        prev = jnp.where(is_first, n_tiles * R - 1, t * R - 1)
        above = xn_s[pl.ds(prev, 1)]
        dh = xn_t - jnp.concatenate([xn_t[:, -1:], xn_t[:, :-1]], axis=1)
        dv = xn_t - jnp.concatenate([above, xn_t[:-1, :]], axis=0)
        part = jnp.sum(jnp.sqrt(dh * dh + dv * dv))
        tvacc[0] = jnp.where(is_first, part, tvacc[0] + part)

        @pl.when(is_last)
        def _meta():
            tv_ref[b] = tvacc[0]
            meta_ref[b, 0] = smem[1]
            meta_ref[b, 1] = smem[2]


@partial(jax.jit, static_argnames=("n_sweeps", "positivity", "tile_rows", "interpret"))
def myula_prox_tv_tiled(
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
    tile_rows: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-tiled fused MYULA + Chambolle prox + TV norm for >512² images:
    xn and both dual fields live in VMEM *scratch* for the whole step while
    x/prox/gradF/Z stream through once in row tiles — the dual-ascent sweeps
    touch HBM not at all (the prox-only tiled kernel re-streams g every
    sweep and, pre-gating, wrote f back every sweep).  Semantics identical
    to myula_prox_tv (ops/tv.py math: Neumann stencils, fresh duals, early
    exit on the pre-update fixed-point residual; circular-difference TV).

    3 whole-image scratch fields cap the size: 3·M·N·4 bytes must fit the
    ~16 MB scoped-VMEM budget alongside the streamed tiles, so f32 1024² is
    the design point (2048² falls back to the XLA path).  Accepts (M, N) or
    (B, M, N); chains run sequentially in the outermost grid dim sharing the
    scratch fields, so any B works."""
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "myula_prox_tv_tiled requires a TPU backend; use interpret=True on CPU"
        )
    squeeze = x.ndim == 2
    if squeeze:
        x, prox_cache, grad_f, z = x[None], prox_cache[None], grad_f[None], z[None]
    B, M, N = x.shape
    assert M % tile_rows == 0, (M, tile_rows)
    T = M // tile_rows
    scal = jnp.stack(
        [jnp.asarray(gamma, x.dtype), jnp.asarray(lam, x.dtype),
         jnp.asarray(lam_theta, x.dtype), jnp.asarray(tau, x.dtype),
         jnp.asarray(tol, x.dtype)]
    )
    # inputs stream tiles only during the MYULA phase (pinned to block 0
    # afterwards); xn writes back only during the MYULA phase (pinned to the
    # last tile afterwards — its final flush re-writes that tile, idempotent);
    # f writes back only during the assemble phase (pinned to block 0 before)
    in_spec = pl.BlockSpec(
        (1, tile_rows, N),
        lambda b, s, t: (b, jnp.where(s == 0, t, 0), 0),
        memory_space=pltpu.VMEM,
    )
    xn_spec = pl.BlockSpec(
        (1, tile_rows, N),
        lambda b, s, t: (b, jnp.where(s == 0, t, T - 1), 0),
        memory_space=pltpu.VMEM,
    )
    f_spec = pl.BlockSpec(
        (1, tile_rows, N),
        lambda b, s, t: (b, jnp.where(s == n_sweeps + 1, t, 0), 0),
        memory_space=pltpu.VMEM,
    )
    xn, f, tv, meta = pl.pallas_call(
        partial(_tiled_fused_kernel, n_sweeps=n_sweeps, tile_rows=tile_rows,
                n_tiles=T, positivity=bool(positivity)),
        grid=(B, n_sweeps + 2, T),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, N), x.dtype),
            jax.ShapeDtypeStruct((B, M, N), x.dtype),
            jax.ShapeDtypeStruct((B,), x.dtype),
            jax.ShapeDtypeStruct((B, 2), jnp.float32),
        ),
        in_specs=[in_spec, in_spec, in_spec, in_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            xn_spec,
            f_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, N), x.dtype),      # xn
            pltpu.VMEM((M, N), x.dtype),      # px
            pltpu.VMEM((M, N), x.dtype),      # py
            pltpu.VMEM((1, N), x.dtype),      # previous tile's old last px row
            pltpu.SMEM((4,), jnp.float32),    # err acc, k, err, active
            pltpu.SMEM((1,), x.dtype),        # tv accumulator
        ],
        interpret=interpret,
    )(x, prox_cache, grad_f, z, scal)
    if squeeze:
        xn, f, tv = xn[0], f[0], tv[0]
    return xn, f, tv
