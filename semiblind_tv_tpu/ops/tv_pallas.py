"""Pallas TPU kernel for the Chambolle TV-prox dual ascent.

The Chambolle inner loop is the innermost hot kernel of the whole framework
(25 dual-ascent stencil sweeps per MYULA step, 10 per SALSA outer
iteration — reference utils/chambolle_prox_TV_stop.m:120-144).  The pure-XLA
version in ops/tv.py materialises px/py/divp/gradients in HBM every sweep;
this kernel keeps the image and both dual fields resident in VMEM across
ALL sweeps, so the loop becomes compute-bound on the VPU instead of
HBM-bandwidth-bound.

A 512x512 f32 problem needs ~4 VMEM-resident fields (g, px, py + temps)
≈ 4 MB — comfortably within the ~16 MB/core budget.  Chain batching is
native: a (B, M, N) input runs on a grid of B programs, one chain per
program with its own VMEM-resident duals and its own masked early exit
(do NOT vmap a pallas_call over chains — the batching rule picks losing
block shapes; pass the batch in).  λ/τ/tol ride in SMEM so they may be
traced values (λθ changes every SAPG iteration).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semiblind_tv_tpu.ops.tv import ChambolleState

__all__ = ["chambolle_prox_pallas"]


def _kernel(g_ref, scal_ref, px_in_ref, py_in_ref, f_ref, px_ref, py_ref, meta_ref,
            *, max_iter: int):
    g = g_ref[0]
    lam, tau, tol = scal_ref[0], scal_ref[1], scal_ref[2]
    glam = g / lam

    M, N = g.shape
    zrow = jnp.zeros((1, N), g.dtype)
    zcol = jnp.zeros((M, 1), g.dtype)

    def div(p1, p2):
        u = jnp.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
        v = jnp.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
        return u + v

    def body(_, carry):
        px, py, k, err, active = carry
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
        err = jnp.where(active, step_err, err)
        k = k + active.astype(k.dtype)
        active = jnp.logical_and(active, step_err > tol)
        return px, py, k, err, active

    init = (
        px_in_ref[0],
        py_in_ref[0],
        jnp.zeros((), jnp.float32),
        jnp.array(jnp.inf, g.dtype),
        jnp.array(True),
    )
    px, py, k, err, _ = jax.lax.fori_loop(0, max_iter, body, init)

    px_ref[0] = px
    py_ref[0] = py
    f_ref[0] = g - lam * div(px, py)
    # meta is whole-array SMEM (blocked 2-D SMEM outputs violate the 8x128
    # lowering rule); the TPU grid is sequential so per-program row writes
    # are race-free
    i = pl.program_id(0)
    meta_ref[i, 0] = k
    meta_ref[i, 1] = err.astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_iter", "interpret"))
def chambolle_prox_pallas(
    g: jnp.ndarray,
    lam,
    max_iter: int,
    tau: float = 0.249,
    tol: float = 1e-3,
    duals: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ChambolleState]:
    """Drop-in replacement for ops.tv.chambolle_prox backed by a Pallas kernel.

    Accepts a single (M, N) image or a (B, M, N) chain batch (grid of B
    programs, duals VMEM-resident per program).  interpret=True runs the
    kernel in Pallas interpret mode (CPU test coverage of the kernel math)."""
    squeeze = g.ndim == 2
    if squeeze:
        g = g[None]
    B, M, N = g.shape
    if duals is None:
        px0 = jnp.zeros_like(g)
        py0 = jnp.zeros_like(g)
    else:
        px0, py0 = duals
        if squeeze:
            px0, py0 = px0[None], py0[None]
    scal = jnp.stack(
        [jnp.asarray(lam, g.dtype), jnp.asarray(tau, g.dtype), jnp.asarray(tol, g.dtype)]
    )

    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f, px, py, meta = pl.pallas_call(
        partial(_kernel, max_iter=max_iter),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct((B, 2), jnp.float32),
        ),
        in_specs=[
            img_spec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            img_spec(),
            img_spec(),
        ],
        out_specs=(
            img_spec(),
            img_spec(),
            img_spec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(g, scal, px0, py0)

    iters = meta[:, 0].astype(jnp.int32)
    err = meta[:, 1].astype(g.dtype)
    if squeeze:
        f, px, py, iters, err = f[0], px[0], py[0], iters[0], err[0]
    return f, ChambolleState(px=px, py=py, iters=iters, err=err)
