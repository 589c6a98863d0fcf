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

__all__ = [
    "chambolle_prox_pallas", "chambolle_prox_tiled", "chunked_chain_call",
    "dual_ascent_loop", "neumann_div", "tiled_sweep_phase", "tiled_divergence",
]

# Largest chain-grid the 512² whole-image Mosaic kernels are known to compile
# at on this runtime: B = 32 compiles for the prox kernel (RESULTS.md r2) but
# B ≥ 48 crashes the remote compiler for BOTH kernels, so every batched
# wrapper chunks larger batches into sequential ≤MAX_GRID_CHAINS grids via
# lax.map.  TPU grid programs are sequential per core anyway, so chunking
# costs nothing beyond the (tiny) per-launch overhead — a user asking for
# B = 64 chains gets the per-chip plateau rate instead of a compiler crash.
MAX_GRID_CHAINS = 24


def chunked_chain_call(run, arrays, max_grid: int = MAX_GRID_CHAINS):
    """Run `run(*arrays)` — a batched Mosaic kernel whose grid is the shared
    leading (chain) dimension of `arrays`, returning a tuple of arrays with
    the same leading dimension — in balanced sequential chunks of at most
    `max_grid` chains.

    Balanced chunking (nc = ceil(B/max), chunk = ceil(B/nc)) minimises
    zero-padding: B = 48 runs as 2×24 with no padding, B = 64 as 3×22 with
    2 padded chains whose outputs are discarded.
    """
    B = arrays[0].shape[0]
    if B <= max_grid:
        return run(*arrays)
    nc = -(-B // max_grid)
    chunk = -(-B // nc)
    pad = nc * chunk - B

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape((nc, chunk) + a.shape[1:])

    outs = jax.lax.map(lambda xs: run(*xs), tuple(prep(a) for a in arrays))
    return tuple(o.reshape((nc * chunk,) + o.shape[2:])[:B] for o in outs)


def neumann_div(p1, p2):
    """Neumann-boundary divergence of the dual field (reference
    utils/chambolle_prox_TV_stop.m:152-159), as in-kernel concatenates."""
    u = jnp.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
    v = jnp.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
    return u + v


def dual_ascent_loop(glam, tau, tol, max_iter: int, px0, py0):
    """Shared in-kernel Chambolle dual-ascent loop: `max_iter` sweeps of
    p ← (p + τ∇u)/(1 + τ|∇u|) with early exit on the pre-update fixed-point
    residual (reference utils/chambolle_prox_TV_stop.m:120-144).

    Early exit is a true `lax.while_loop` rather than a frozen-state masked
    fori_loop: `active` is monotone, so stopping the loop is bit-identical
    to freezing the carry, and dropping the two per-field selects + the
    per-sweep mask bookkeeping measures 9% faster per sweep on the VPU
    (benchmarks/probe_prox_variants.py: 5.13 → 4.65 µs/sweep at 512²,
    maxdiff 0.0).  Returns (px, py, sweeps_run, last_residual)."""
    M, N = glam.shape
    zrow = jnp.zeros((1, N), glam.dtype)
    zcol = jnp.zeros((M, 1), glam.dtype)

    def cond(carry):
        _, _, k, err = carry
        return jnp.logical_and(k < max_iter, err > tol)

    def body(carry):
        px, py, k, err = carry
        u = neumann_div(px, py) - glam
        upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow], axis=0)
        upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol], axis=1)
        tmp = jnp.sqrt(upx * upx + upy * upy)
        rx = -upx + tmp * px
        ry = -upy + tmp * py
        step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
        denom = 1.0 + tau * tmp
        px = (px + tau * upx) / denom
        py = (py + tau * upy) / denom
        return px, py, k + 1.0, step_err

    return jax.lax.while_loop(
        cond, body,
        (px0, py0, jnp.zeros((), jnp.float32), jnp.array(jnp.inf, glam.dtype)),
    )


def _kernel(g_ref, scal_ref, px_in_ref, py_in_ref, f_ref, px_ref, py_ref, meta_ref,
            *, max_iter: int):
    g = g_ref[0]
    lam, tau, tol = scal_ref[0], scal_ref[1], scal_ref[2]
    px, py, k, err = dual_ascent_loop(
        g / lam, tau, tol, max_iter, px_in_ref[0], py_in_ref[0]
    )
    px_ref[0] = px
    py_ref[0] = py
    f_ref[0] = g - lam * neumann_div(px, py)
    # meta is whole-array SMEM (blocked 2-D SMEM outputs violate the 8x128
    # lowering rule); the TPU grid is sequential so per-program row writes
    # are race-free
    i = pl.program_id(0)
    meta_ref[i, 0] = k
    meta_ref[i, 1] = err.astype(jnp.float32)


def _kernel_fresh(g_ref, scal_ref, f_ref, meta_ref, *, max_iter: int):
    """Lean variant for the SAPG inner prox: duals always start at zero and
    are never returned (the SAPG step discards them — estimator.prox_b), so
    they stay loop-carried VMEM temps instead of I/O blocks.  That cuts the
    kernel's image-sized I/O from 6 blocks to 2: with Mosaic's grid
    double-buffering the fat kernel's scoped-VMEM footprint is 16.68 MB at
    512² (> the 16 MB limit — the r2 ≥48-chain "remote-compiler crash" was
    exactly this OOM surfaced as an HTTP 500), while this one fits at any
    chain count."""
    g = g_ref[0]
    lam, tau, tol = scal_ref[0], scal_ref[1], scal_ref[2]
    px, py, k, err = dual_ascent_loop(
        g / lam, tau, tol, max_iter, jnp.zeros_like(g), jnp.zeros_like(g)
    )
    f_ref[0] = g - lam * neumann_div(px, py)
    i = pl.program_id(0)
    meta_ref[i, 0] = k
    meta_ref[i, 1] = err.astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_iter", "interpret", "return_state"))
def chambolle_prox_pallas(
    g: jnp.ndarray,
    lam,
    max_iter: int,
    tau: float = 0.249,
    tol: float = 1e-3,
    duals: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    interpret: bool = False,
    return_state: bool = True,
) -> Tuple[jnp.ndarray, ChambolleState]:
    """Drop-in replacement for ops.tv.chambolle_prox backed by a Pallas kernel.

    Accepts a single (M, N) image or a (B, M, N) chain batch (grid of B
    programs, duals VMEM-resident per program).  interpret=True runs the
    kernel in Pallas interpret mode (CPU test coverage of the kernel math).

    return_state=False (requires duals=None) selects the lean fresh-duals
    kernel — duals in VMEM scratch, f the only image-sized output; the
    returned state carries zero px/py (callers discard it).  This is the
    only 512² form whose scoped-VMEM footprint fits at high chain counts."""
    squeeze = g.ndim == 2
    if squeeze:
        g = g[None]
    B, M, N = g.shape
    scal = jnp.stack(
        [jnp.asarray(lam, g.dtype), jnp.asarray(tau, g.dtype), jnp.asarray(tol, g.dtype)]
    )

    img_spec = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    if not return_state:
        if duals is not None:
            raise ValueError("return_state=False requires duals=None (fresh duals)")

        def run_fresh(gc):
            Bc = gc.shape[0]
            return pl.pallas_call(
                partial(_kernel_fresh, max_iter=max_iter),
                grid=(Bc,),
                out_shape=(
                    jax.ShapeDtypeStruct(gc.shape, gc.dtype),
                    jax.ShapeDtypeStruct((Bc, 2), jnp.float32),
                ),
                in_specs=[img_spec(), pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=(img_spec(), pl.BlockSpec(memory_space=pltpu.SMEM)),
                interpret=interpret,
            )(gc, scal)

        f, meta = chunked_chain_call(run_fresh, (g,))
        iters = meta[:, 0].astype(jnp.int32)
        err = meta[:, 1].astype(g.dtype)
        zero = jnp.zeros_like(f)
        if squeeze:
            f, iters, err, zero = f[0], iters[0], err[0], zero[0]
        return f, ChambolleState(px=zero, py=zero, iters=iters, err=err)

    if duals is None:
        px0 = jnp.zeros_like(g)
        py0 = jnp.zeros_like(g)
    else:
        px0, py0 = duals
        if squeeze:
            px0, py0 = px0[None], py0[None]

    def run(gc, pxc, pyc):
        Bc = gc.shape[0]
        return pl.pallas_call(
            partial(_kernel, max_iter=max_iter),
            grid=(Bc,),
            out_shape=(
                jax.ShapeDtypeStruct(gc.shape, gc.dtype),
                jax.ShapeDtypeStruct(gc.shape, gc.dtype),
                jax.ShapeDtypeStruct(gc.shape, gc.dtype),
                jax.ShapeDtypeStruct((Bc, 2), jnp.float32),
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
        )(gc, scal, pxc, pyc)

    f, px, py, meta = chunked_chain_call(run, (g, px0, py0))

    iters = meta[:, 0].astype(jnp.int32)
    err = meta[:, 1].astype(g.dtype)
    if squeeze:
        f, px, py, iters, err = f[0], px[0], py[0], iters[0], err[0]
    return f, ChambolleState(px=px, py=py, iters=iters, err=err)


# ---------------------------------------------------------------------------
# Row-tiled variant for images too large for whole-image VMEM residency
# ---------------------------------------------------------------------------

def _col_div(p):
    """Column (Neumann) part of the divergence for a (rows, N) block."""
    return jnp.concatenate(
        [p[:, :1], p[:, 1:-1] - p[:, :-2], -p[:, -1:]], axis=1
    )


def tiled_sweep_phase(px_s, py_s, stash, smem, glam, glam_next_row, t,
                      *, tile_rows: int, n_tiles: int, tau, tol):
    """One Jacobi dual-ascent sweep over tile t of the VMEM-scratch dual
    fields.  glam = this tile's g/λ rows; glam_next_row = the next tile's
    (still un-updated, sweep s−1) first g/λ row.  Tile t reads tile t−1's
    pre-update last px row from the one-row stash.  Shared by the prox-only
    and fused tiled kernels (same math as dual_ascent_loop, decomposed over
    row tiles)."""
    R = tile_rows
    N = glam.shape[1]
    dtype = glam.dtype
    zrow = jnp.zeros((1, N), dtype)
    is_first = t == 0
    is_last = t == n_tiles - 1
    active = smem[3] > 0.0
    px_t = px_s[pl.ds(t * R, R)]
    py_t = py_s[pl.ds(t * R, R)]

    above = jnp.where(is_first, zrow, stash[...])
    u = px_t - jnp.concatenate([above, px_t[:-1, :]], axis=0)
    last_u = jnp.where(is_last, -px_t[-1:, :], u[-1:, :])
    u = jnp.concatenate([u[:-1, :], last_u], axis=0)
    u = u + _col_div(py_t) - glam

    nxt = jnp.minimum((t + 1) * R, (n_tiles - 1) * R)
    px_n0 = px_s[pl.ds(nxt, 1)]
    py_n0 = py_s[pl.ds(nxt, 1)]
    u_b = (px_n0 - px_t[-1:, :]) + _col_div(py_n0) - glam_next_row

    upx = jnp.concatenate([u[1:, :], u_b], axis=0) - u
    upx_last = jnp.where(is_last, jnp.zeros((1, N), dtype), upx[-1:, :])
    upx = jnp.concatenate([upx[:-1, :], upx_last], axis=0)
    upy = jnp.concatenate(
        [u[:, 1:] - u[:, :-1], jnp.zeros((R, 1), dtype)], axis=1
    )
    tmp = jnp.sqrt(upx * upx + upy * upy)
    rx = -upx + tmp * px_t
    ry = -upy + tmp * py_t
    part = (jnp.sum(rx * rx) + jnp.sum(ry * ry)).astype(jnp.float32)

    @pl.when(is_first)
    def _():
        smem[0] = part

    @pl.when(jnp.logical_not(is_first))
    def _():
        smem[0] = smem[0] + part

    denom = 1.0 + tau * tmp
    new_px = jnp.where(active, (px_t + tau * upx) / denom, px_t)
    new_py = jnp.where(active, (py_t + tau * upy) / denom, py_t)

    # stash the OLD last row for tile t+1's halo, then commit
    stash[...] = px_t[-1:, :]
    px_s[pl.ds(t * R, R)] = new_px
    py_s[pl.ds(t * R, R)] = new_py

    @pl.when(is_last)
    def _finalise_sweep():
        err = jnp.sqrt(smem[0])
        act = smem[3] > 0.0
        smem[1] = jnp.where(act, smem[1] + 1.0, smem[1])
        smem[2] = jnp.where(act, err, smem[2])
        smem[3] = jnp.where(
            jnp.logical_and(act, err > tol.astype(jnp.float32)), 1.0, 0.0
        )


def tiled_divergence(px_s, py_s, t, *, tile_rows: int, n_tiles: int):
    """Neumann divergence rows for tile t from the converged scratch duals."""
    R = tile_rows
    px_t = px_s[pl.ds(t * R, R)]
    py_t = py_s[pl.ds(t * R, R)]
    N = px_t.shape[1]
    zrow = jnp.zeros((1, N), px_t.dtype)
    is_first = t == 0
    is_last = t == n_tiles - 1
    prev = jnp.maximum(t * R - 1, 0)
    above = jnp.where(is_first, zrow, px_s[pl.ds(prev, 1)])
    u = px_t - jnp.concatenate([above, px_t[:-1, :]], axis=0)
    last_u = jnp.where(is_last, -px_t[-1:, :], u[-1:, :])
    u = jnp.concatenate([u[:-1, :], last_u], axis=0)
    return u + _col_div(py_t)


def _tiled_kernel(g_ref, gnext_ref, scal_ref, f_ref, meta_ref,
                  px_s, py_s, stash, smem,
                  *, n_sweeps: int, tile_rows: int, n_tiles: int):
    """Grid (B, n_sweeps + 2, T), T fastest, chains outermost.  Per chain:
    phase s=0 loads the zero duals into the scratch fields; phases
    1..n_sweeps are Jacobi dual-ascent sweeps (tile t reads its own and
    tile t+1's rows at sweep s−1 from scratch, and tile t−1's pre-update
    last row from the one-row stash); the final phase assembles f from the
    converged duals.  px/py live in VMEM scratch for the WHOLE solve and
    are re-zeroed per chain (chains run sequentially, so one (M, N) dual
    pair serves any B) — per sweep the only HBM traffic is the streamed g
    blocks (the whole-image kernel needs ~8 resident fields and caps at
    512²; this one needs 2 fields + one tile's working set).
    """
    b = pl.program_id(0)
    s = pl.program_id(1)
    t = pl.program_id(2)
    R = tile_rows
    lam, tau, tol = scal_ref[0], scal_ref[1], scal_ref[2]
    g = g_ref[0]
    N = g.shape[1]
    dtype = g.dtype
    is_last = t == n_tiles - 1

    @pl.when(jnp.logical_and(s == 0, t == 0))
    def _init_smem():
        smem[0] = 0.0          # err accumulator
        smem[1] = 0.0          # iteration count k
        smem[2] = jnp.inf      # last fixed-point residual
        smem[3] = 1.0          # active flag

    @pl.when(s == 0)
    def _load():
        px_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
        py_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
        f_ref[0] = g  # placeholder; overwritten by the final phase

    @pl.when(jnp.logical_and(s >= 1, s <= n_sweeps))
    def _sweep():
        # sweep-(s−1) u of the next tile's first row (its px/py rows are
        # still un-updated in scratch; our own OLD last row is px_t[-1])
        tiled_sweep_phase(
            px_s, py_s, stash, smem, g / lam, gnext_ref[0, 0:1, :] / lam, t,
            tile_rows=R, n_tiles=n_tiles, tau=tau, tol=tol,
        )
        # keep the revisited output block defined (the gated index map pins
        # the f block during sweep phases, so nothing lands in HBM here)
        f_ref[0] = px_s[pl.ds(t * R, R)]

    @pl.when(s == n_sweeps + 1)
    def _assemble():
        f_ref[0] = g - lam * tiled_divergence(
            px_s, py_s, t, tile_rows=R, n_tiles=n_tiles
        )

        @pl.when(is_last)
        def _meta():
            meta_ref[b, 0] = smem[1]
            meta_ref[b, 1] = smem[2]


@partial(jax.jit, static_argnames=("max_iter", "tile_rows", "interpret"))
def chambolle_prox_tiled(
    g: jnp.ndarray,
    lam,
    max_iter: int,
    tau: float = 0.249,
    tol: float = 1e-3,
    tile_rows: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ChambolleState]:
    """Chambolle prox for images whose whole-image kernel exceeds VMEM
    (>512²): duals stay VMEM-scratch-resident across all sweeps while the
    image streams through in row tiles.  Same math/early exit as
    ops.tv.chambolle_prox (fresh duals; the tiled variant does not take or
    return warm-start duals — its SAPG use discards them).

    Accepts (M, N) or a (B, M, N) chain batch: chains run sequentially in
    the outermost grid dimension, re-using the single (M, N) scratch dual
    pair (B whole-image dual fields would not fit VMEM at these sizes)."""
    squeeze = g.ndim == 2
    if squeeze:
        g = g[None]
    B, M, N = g.shape
    assert M % tile_rows == 0, (M, tile_rows)
    T = M // tile_rows
    scal = jnp.stack(
        [jnp.asarray(lam, g.dtype), jnp.asarray(tau, g.dtype), jnp.asarray(tol, g.dtype)]
    )
    f, meta = pl.pallas_call(
        partial(_tiled_kernel, n_sweeps=max_iter, tile_rows=tile_rows, n_tiles=T),
        grid=(B, max_iter + 2, T),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, N), g.dtype),
            jax.ShapeDtypeStruct((B, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (1, tile_rows, N), lambda b, s, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            # (1, 8, N) halo block (Mosaic sublane minimum); only row 0 is
            # used.  Block index units: rows/8.
            pl.BlockSpec(
                (1, 8, N),
                lambda b, s, t: (
                    b,
                    jnp.minimum((t + 1) * (tile_rows // 8), (T - 1) * (tile_rows // 8)),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            # gated revisit: the f block index is pinned to 0 during the
            # load/sweep phases (equal consecutive indices → Mosaic skips
            # the per-step writeback copy) and streams tiles only in the
            # final assemble phase — per sweep the only HBM traffic is the
            # one streamed g read, not a read+write pair
            pl.BlockSpec(
                (1, tile_rows, N),
                lambda b, s, t: (b, jnp.where(s == max_iter + 1, t, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, N), g.dtype),      # px
            pltpu.VMEM((M, N), g.dtype),      # py
            pltpu.VMEM((1, N), g.dtype),      # previous tile's old last px row
            pltpu.SMEM((4,), jnp.float32),    # err acc, k, err, active
        ],
        interpret=interpret,
    )(g, g, scal)
    iters = meta[:, 0].astype(jnp.int32)
    err = meta[:, 1].astype(g.dtype)
    zero = jnp.zeros_like(f)
    if squeeze:
        f, iters, err, zero = f[0], iters[0], err[0], zero[0]
    return f, ChambolleState(px=zero, py=zero, iters=iters, err=err)
