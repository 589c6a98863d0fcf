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
    "chambolle_prox_pallas", "chambolle_prox_tiled", "chambolle_prox_streamed",
    "chunked_chain_call",
    "dual_ascent_loop", "neumann_div", "tiled_sweep_phase", "tiled_divergence",
    "streamed_tile_rows", "streamed_call", "box_muller_normals",
]

# Largest chain-grid the 512² whole-image Mosaic kernels are known to compile
# at on this runtime: B = 32 compiles for the prox kernel (RESULTS.md r2) but
# B ≥ 48 crashes the remote compiler for BOTH kernels, so every batched
# wrapper chunks larger batches into sequential ≤MAX_GRID_CHAINS grids via
# lax.map.  TPU grid programs are sequential per core anyway, so chunking
# costs nothing beyond the (tiny) per-launch overhead — a user asking for
# B = 64 chains gets the per-chip plateau rate instead of a compiler crash.
# Env override SEMIBLIND_MAX_GRID_CHAINS for chunk-geometry probes
# (benchmarks/probe_chain_droop.py).
import os as _os

MAX_GRID_CHAINS = int(_os.environ.get("SEMIBLIND_MAX_GRID_CHAINS", "24"))


def chunked_chain_call(run, arrays, max_grid: int = MAX_GRID_CHAINS):
    """Run `run(*arrays)` — a batched Mosaic kernel whose grid is the shared
    leading (chain) dimension of `arrays`, returning a tuple of arrays with
    the same leading dimension — in balanced sequential chunks of at most
    `max_grid` chains.

    Chunk geometry weighs padding against launches (r4 droop study: B = 64
    as 4×16 measures 6615 chain-iter/s vs 6330 as 3×22 with 2 padded
    chains — the padding waste, not the extra launch, was the B ≥ 32
    droop): nc scans upward from ceil(B/max) minimising
    (padded chains + launches), so B = 48 → 2×24, B = 64 → 4×16,
    B = 25 → 2×13 (one extra launch is not worth removing one pad chain).
    """
    B = arrays[0].shape[0]
    if B <= max_grid:
        return run(*arrays)
    nc0 = -(-B // max_grid)
    nc = min(range(nc0, nc0 + 4),
             key=lambda n: (n * (-(-B // n)) - B + n, n))
    chunk = -(-B // nc)
    pad = nc * chunk - B

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape((nc, chunk) + a.shape[1:])

    outs = jax.lax.map(lambda xs: run(*xs), tuple(prep(a) for a in arrays))
    return tuple(o.reshape((nc * chunk,) + o.shape[2:])[:B] for o in outs)


def box_muller_normals(shape, dtype):
    """Standard normals from the seeded per-core TPU PRNG (Box–Muller).
    Both branches of each (u1, u2) pair are used (z = r·cos, r·sin over a
    half-height draw when the row count is even), halving the log/sqrt/
    cos-class transcendental count per element.  u1 maps the top 24 bits
    into (0, 1] so log never sees 0; u2 into [0, 1).  Callers must
    pltpu.prng_seed first."""
    M, N = shape
    paired = M % 2 == 0
    draw = (M // 2, N) if paired else shape

    def uniform(offset):
        bits = pltpu.bitcast(pltpu.prng_random_bits(draw), jnp.uint32)
        # top 24 bits < 2^24 fit non-negative int32 — Mosaic lowers
        # int32→float but not uint32→float
        top = pltpu.bitcast(bits >> 8, jnp.int32).astype(dtype)
        return (top + offset) * dtype.type(2.0**-24)

    u1 = uniform(1.0)   # (0, 1]
    u2 = uniform(0.0)   # [0, 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = dtype.type(6.283185307179586) * u2
    if paired:
        return jnp.concatenate([r * jnp.cos(t), r * jnp.sin(t)], axis=0)
    return r * jnp.cos(t)


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


def _tiled_kernel(*refs, n_sweeps: int, tile_rows: int, n_tiles: int,
                  warm: bool = False):
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

    warm=True streams caller duals into the scratch fields at the load
    phase and the converged duals back out at assembly (SALSA's
    'dualvars' warm start, SALSA/SALSA_v2.m:429, at 1024² kernel grade).
    """
    if warm:
        (g_ref, gnext_ref, pxin_ref, pyin_ref, scal_ref,
         f_ref, pxout_ref, pyout_ref, meta_ref,
         px_s, py_s, stash, smem) = refs
    else:
        (g_ref, gnext_ref, scal_ref, f_ref, meta_ref,
         px_s, py_s, stash, smem) = refs
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
        if warm:
            px_s[pl.ds(t * R, R)] = pxin_ref[0]
            py_s[pl.ds(t * R, R)] = pyin_ref[0]
        else:
            px_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
            py_s[pl.ds(t * R, R)] = jnp.zeros((R, N), dtype)
        f_ref[0] = g  # placeholder; overwritten by the final phase
        if warm:
            # pinned px/py output blocks stay defined through every phase
            pxout_ref[0] = px_s[pl.ds(t * R, R)]
            pyout_ref[0] = py_s[pl.ds(t * R, R)]

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
        if warm:
            pxout_ref[0] = px_s[pl.ds(t * R, R)]
            pyout_ref[0] = py_s[pl.ds(t * R, R)]

    @pl.when(s == n_sweeps + 1)
    def _assemble():
        f_ref[0] = g - lam * tiled_divergence(
            px_s, py_s, t, tile_rows=R, n_tiles=n_tiles
        )
        if warm:
            pxout_ref[0] = px_s[pl.ds(t * R, R)]
            pyout_ref[0] = py_s[pl.ds(t * R, R)]

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
    duals: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, ChambolleState]:
    """Chambolle prox for images whose whole-image kernel exceeds VMEM
    (>512²): duals stay VMEM-scratch-resident across all sweeps while the
    image streams through in row tiles.  Same math/early exit as
    ops.tv.chambolle_prox.  duals=(px, py) warm-starts the ascent and
    streams the converged duals back out (SALSA's 'dualvars',
    SALSA_v2.m:429); without it the duals start fresh and the returned
    state carries zeros (the SAPG use discards them).

    Accepts (M, N) or a (B, M, N) chain batch: chains run sequentially in
    the outermost grid dimension, re-using the single (M, N) scratch dual
    pair (B whole-image dual fields would not fit VMEM at these sizes)."""
    squeeze = g.ndim == 2
    if squeeze:
        g = g[None]
    B, M, N = g.shape
    assert M % tile_rows == 0, (M, tile_rows)
    T = M // tile_rows
    warm = duals is not None
    scal = jnp.stack(
        [jnp.asarray(lam, g.dtype), jnp.asarray(tau, g.dtype), jnp.asarray(tol, g.dtype)]
    )
    tile_spec = pl.BlockSpec(
        (1, tile_rows, N), lambda b, s, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    # gated revisit: the f/px/py output block indices are pinned to 0
    # during the load/sweep phases (equal consecutive indices → Mosaic
    # skips the per-step writeback copy) and stream tiles only in the
    # final assemble phase — per sweep the only HBM traffic is the one
    # streamed g read, not a read+write pair
    gated_spec = pl.BlockSpec(
        (1, tile_rows, N),
        lambda b, s, t: (b, jnp.where(s == max_iter + 1, t, 0), 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        tile_spec,
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
    ]
    inputs = [g, g]
    out_shape = [jax.ShapeDtypeStruct((B, M, N), g.dtype)]
    out_specs = [gated_spec]
    if warm:
        px0, py0 = duals
        if squeeze:
            px0, py0 = px0[None], py0[None]
        # warm duals stream in tile-by-tile at the load phase (pinned 0 after)
        warm_in = pl.BlockSpec(
            (1, tile_rows, N),
            lambda b, s, t: (b, jnp.where(s == 0, t, 0), 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [warm_in, warm_in]
        inputs += [px0, py0]
        out_shape += [
            jax.ShapeDtypeStruct((B, M, N), g.dtype),
            jax.ShapeDtypeStruct((B, M, N), g.dtype),
        ]
        out_specs += [gated_spec, gated_spec]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(scal)
    out_shape.append(jax.ShapeDtypeStruct((B, 2), jnp.float32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    outs = pl.pallas_call(
        partial(_tiled_kernel, n_sweeps=max_iter, tile_rows=tile_rows,
                n_tiles=T, warm=warm),
        grid=(B, max_iter + 2, T),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((M, N), g.dtype),      # px
            pltpu.VMEM((M, N), g.dtype),      # py
            pltpu.VMEM((1, N), g.dtype),      # previous tile's old last px row
            pltpu.SMEM((4,), jnp.float32),    # err acc, k, err, active
        ],
        interpret=interpret,
    )(*inputs)
    if warm:
        f, px, py, meta = outs
    else:
        f, meta = outs
        px = py = jnp.zeros_like(f)
    iters = meta[:, 0].astype(jnp.int32)
    err = meta[:, 1].astype(g.dtype)
    if squeeze:
        f, px, py, iters, err = f[0], px[0], py[0], iters[0], err[0]
    return f, ChambolleState(px=px, py=py, iters=iters, err=err)


# ---------------------------------------------------------------------------
# HBM-streamed-dual variant for images whose TWO whole-image dual fields
# exceed VMEM scratch (>= 2048^2 f32): temporally-blocked row tiles
# ---------------------------------------------------------------------------

# Sweeps per streaming pass.  The Jacobi stencil's reach is one row per
# sweep, so a tile padded by K halo rows on each side yields EXACT central
# rows after K local sweeps (standard temporal blocking / overlapped
# tiling) — HBM dual traffic drops from 5 fields/sweep (fetch g+px+py,
# write px+py — measured bandwidth-bound at 3.9 ms/25-sweep 2048^2 prox)
# to ~5/K fields/sweep, leaving the VPU stencil as the bound.  K = 8 keeps
# every DMA offset/size 8-row (sublane-tiling) aligned.
STREAM_SWEEP_BLOCK = 8


def streamed_tile_rows(M: int, N: int, itemsize: int = 4,
                       pipelined: bool = True, fused: bool = False) -> int:
    """Largest power-of-two central-row tile dividing M whose streaming
    working set fits the VMEM budget.  2048^2 f32 -> 64 pipelined / 128
    single-slot (pipelined=False trades DMA overlap for VMEM — the larger-R
    knob), 4096^2 -> 32 / 64.

    Working set in rows of N-wide buffers, S = slots (2 pipelined, 1 sync):
    S·W g window + 2·S·W pxy windows + 2·S·R writeback staging
    (+ 4·S·R myula fetch buffers when fused) + ~5 live (W, N) sweep
    temporaries (the r5 restructured sweep keeps at most px/py/upx/upy +
    one of tmp/denom alive — the r4 8-temp form OOM'd R = 128 even
    single-slot).

    Budgets are fitted to measured compile outcomes, per form: pipelined
    13.5 MB compiles / 14.25 MB OOMs (→ 14 MB budget); single-slot 9 MB
    compiles / 11.5 MB OOMs (→ 10 MB budget — Mosaic's effective liveness
    in the sync form is worse than the hand count, so 2048² R=128 sync
    and 8192² R=32 sync both OOM despite fitting the naive arithmetic;
    both were probed on chip, r5)."""
    budget = int(14 * 2**20) if pipelined else int(10 * 2**20)
    S = 2 if pipelined else 1
    for r in (256, 128, 64, 32):
        w = r + 2 * STREAM_SWEEP_BLOCK
        rows = (3 * S + 5) * w + 2 * S * r + (4 * S * r if fused else 0)
        if M % r == 0 and M >= w and M // r >= 2 and rows * N * itemsize <= budget:
            return r
    raise ValueError(f"no streamed tile size fits M={M}, N={N}")


def _streamed_kernel(*refs, max_iter: int, tile_rows: int, n_tiles: int,
                     sweep_block: int, pipelined: bool = True,
                     mode: str = "plain", ret_duals: bool = False,
                     positivity: bool = True, in_kernel_rng: bool = False):
    """Grid (B,): one program per chain; the whole solve runs in one
    program.  Temporal blocking: per streaming pass each tile fetches a
    (W, N) = (R + 2K, N) row window of g and of the packed duals, runs up
    to K = sweep_block Jacobi sweeps LOCALLY in VMEM (central R rows stay
    exact — the stencil reach is 1 row/sweep), and writes only the central
    rows back.  HBM dual traffic is ~5/K fields per sweep instead of 5.

    The duals ping-pong between two HBM workspaces (pxyA/pxyB, shared
    across the sequential chains): a pass reads `src` and writes the other
    buffer, so the reference's per-sweep early exit stays BIT-EXACT — the
    global residual of every inner sweep is accumulated (central rows
    only, same per-tile partial order as the whole-image op), and when the
    first sub-tol residual lands mid-pass at inner sweep j*, the pass is
    re-run from the intact `src` with limit j*, reproducing exactly the
    state the sequential solver would have stopped at
    (utils/chambolle_prox_TV_stop.m:120-149 semantics at any size).

    Three init modes share the machinery (src = 2 marks the virgin
    source):
      * "plain"  — fresh zero duals, held in-register on the first pass
                   (no zero-prologue writes, no first-pass dual fetch);
      * "warm"   — SALSA's warm start (SALSA/SALSA_v2.m:429): the first
                   pass fetches the caller's px/py fields; with ret_duals
                   the final duals are streamed back out;
      * "fused"  — the ≥2048² SAPG step: a MYULA + TV-norm prologue
                   streams x/prox/gradF/Z once, writes xn to the HBM
                   workspace that then serves as the prox's g (reference
                   hot loop SAPG/SAPG_algorithm_Guassian.m:158-194 — the
                   whole spatial segment in ONE launch).
    """
    fused = mode == "fused"
    warm = mode == "warm"
    i = 0
    if fused:
        if in_kernel_rng:
            x_ref, prox_ref, grad_ref, seed_ref = refs[0:4]
            z_ref = None
            m_refs = (x_ref, prox_ref, grad_ref)
        else:
            x_ref, prox_ref, grad_ref, z_ref = refs[0:4]
            m_refs = (x_ref, prox_ref, grad_ref, z_ref)
        i = 4
        g_ref = None
    else:
        g_ref = refs[0]
        i = 1
        if warm:
            pxin_ref, pyin_ref = refs[i], refs[i + 1]
            i += 2
    scal_ref = refs[i]
    i += 1
    if fused:
        xn_ref = refs[i]
        i += 1
    f_ref, pxyA_ref, pxyB_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    if ret_duals:
        pxout_ref, pyout_ref = refs[i], refs[i + 1]
        i += 2
    if fused:
        tv_ref = refs[i]
        i += 1
    meta_ref = refs[i]
    i += 1
    buf_g, buf_pxy, wpxy, errs, fsem, wsem = refs[i:i + 6]
    i += 6
    if fused:
        mbuf, msem, tvacc, row_prev, row0 = refs[i:i + 5]

    b = pl.program_id(0)
    R, T, K = tile_rows, n_tiles, sweep_block
    W = R + 2 * K
    M = T * R
    lam, tau = scal_ref[0], scal_ref[1]
    N = buf_g.shape[2]
    dtype = buf_g.dtype
    # residual accumulation at the INPUT dtype (an f64 x64/interpret run
    # would otherwise early-exit on a different sweep than the whole-image
    # op on a borderline residual; on TPU inputs are f32 — no change)
    tolv = scal_ref[2].astype(dtype)
    gsrc = xn_ref if fused else g_ref

    def h0_of(t):
        # R and K are multiples of 8, so the clamp stays 8-row aligned —
        # assert it to Mosaic (it cannot prove divisibility through clip)
        return pl.multiple_of(jnp.clip(t * R - K, 0, M - W), 8)

    def central(val, t):
        # central offset c0 = t*R - h0_of(t) takes exactly three values:
        # 0 (first tile), K (interior), 2K (last tile) — blend static
        # slices with jnp.where (Mosaic has no dynamic_slice on values and
        # does not legalize lax.cond's vector select)
        v1 = val[K:K + R]
        v1 = jnp.where(t == 0, val[0:R], v1)
        return jnp.where(t == T - 1, val[2 * K:2 * K + R], v1)

    def g_dma(t, slot):
        return pltpu.make_async_copy(
            gsrc.at[b, pl.ds(h0_of(t), W)], buf_g.at[slot], fsem.at[0, slot]
        )

    def _pxy_dma(ref, t, slot):
        return pltpu.make_async_copy(
            ref.at[:, pl.ds(h0_of(t), W)], buf_pxy.at[slot],
            fsem.at[1, slot],
        )

    def _for_flag(flag, ref_op):
        # run ref_op(pxyA) when flag == 0, ref_op(pxyB) when flag == 1;
        # flag == 2 (virgin source) matches neither — zero/warm/fused
        # first-pass handling is the caller's.  Descriptors are constructed
        # INSIDE the predicated bodies (an unused descriptor is a Mosaic
        # error).
        @pl.when(flag == 0)
        def _():
            ref_op(pxyA_ref)

        @pl.when(flag == 1)
        def _():
            ref_op(pxyB_ref)

    def _warm_in_dma(which, t, slot):
        ref = pxin_ref if which == 0 else pyin_ref
        return pltpu.make_async_copy(
            ref.at[b, pl.ds(h0_of(t), W)], buf_pxy.at[slot, which],
            fsem.at[2 + which, slot],
        )

    def start_fetch(src, t, slot):
        g_dma(t, slot).start()
        _for_flag(src, lambda ref: _pxy_dma(ref, t, slot).start())
        if warm:
            @pl.when(src == 2)
            def _():
                _warm_in_dma(0, t, slot).start()
                _warm_in_dma(1, t, slot).start()

    def wait_fetch(src, t, slot):
        g_dma(t, slot).wait()
        _for_flag(src, lambda ref: _pxy_dma(ref, t, slot).wait())
        if warm:
            @pl.when(src == 2)
            def _():
                _warm_in_dma(0, t, slot).wait()
                _warm_in_dma(1, t, slot).wait()

    def window_duals(src, p):
        # the fetched window duals, or in-register zeros on the virgin
        # first pass of the non-warm modes (buf_pxy holds garbage there)
        px_w, py_w = buf_pxy[p, 0], buf_pxy[p, 1]
        if not warm:
            px_w = jnp.where(src == 2, jnp.zeros((), dtype), px_w)
            py_w = jnp.where(src == 2, jnp.zeros((), dtype), py_w)
        return px_w, py_w

    def _wb_dma(ref, t, slot):
        return pltpu.make_async_copy(
            wpxy.at[slot], ref.at[:, pl.ds(t * R, R)], wsem.at[slot]
        )

    def start_wb(dst, t, slot):
        _for_flag(dst, lambda ref: _wb_dma(ref, t, slot).start())

    def wait_wb(dst, t, slot):
        _for_flag(dst, lambda ref: _wb_dma(ref, t, slot).wait())

    # ---- fused prologue: MYULA update + circular TV norm, xn -> workspace -
    if fused:
        gamma, lam_my, sigma2 = scal_ref[3], scal_ref[4], scal_ref[5]

        def m_start(t, slot):
            for j, r in enumerate(m_refs):
                pltpu.make_async_copy(
                    r.at[b, pl.ds(t * R, R)], mbuf.at[slot, j],
                    msem.at[slot, j],
                ).start()

        def m_wait(t, slot):
            for j, r in enumerate(m_refs):
                pltpu.make_async_copy(
                    r.at[b, pl.ds(t * R, R)], mbuf.at[slot, j],
                    msem.at[slot, j],
                ).wait()

        def xn_wb(t, slot):
            return pltpu.make_async_copy(
                wpxy.at[slot, 0], xn_ref.at[b, pl.ds(t * R, R)],
                wsem.at[slot],
            )

        tvacc[0] = jnp.zeros((), dtype)
        if in_kernel_rng:
            # per-chain hardware-PRNG stream (EXTENSION, opt-in — the seeds
            # come from the same split-key sequence as the threefry path,
            # but the in-kernel Box-Muller realization differs; see
            # myula_prox_tv_rng).  Tiles draw in a fixed order, so the
            # stream is deterministic per (seed, geometry).
            pltpu.prng_seed(seed_ref[b, 0], seed_ref[b, 1])
        if pipelined:
            m_start(0, 0)

        def pro_body(t, _):
            p = (t & 1) if pipelined else 0
            if pipelined:
                @pl.when(t + 1 < T)
                def _():
                    m_start(t + 1, 1 - p)
            else:
                m_start(t, 0)
            m_wait(t, p)
            xv = mbuf[p, 0]
            zv = (
                box_muller_normals((R, N), dtype)
                if in_kernel_rng else mbuf[p, 3]
            )
            xn = (
                xv
                + gamma * (mbuf[p, 1] - xv) / lam_my
                - gamma * (mbuf[p, 2] / sigma2)
                + jnp.sqrt(2.0 * gamma) * zv
            )
            if positivity:
                xn = jnp.abs(xn)
            # circular-difference TV norm (utils/TVnorm.m): columns wrap
            # within the row, rows wrap globally — row 0's contribution
            # needs xn[M-1] and is deferred to the epilogue via the
            # row0/row_prev stashes (row_prev holds garbage at t = 0 but
            # the row mask keeps it out of the sum)
            dv = xn - jnp.concatenate([row_prev[...], xn[:-1, :]], axis=0)
            dh = xn - jnp.concatenate([xn[:, -1:], xn[:, :-1]], axis=1)
            contrib = jnp.sqrt(dh * dh + dv * dv)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            valid = jnp.logical_or(t > 0, rows2 > 0)
            tvacc[0] = tvacc[0] + jnp.sum(jnp.where(valid, contrib, 0.0))

            @pl.when(t == 0)
            def _():
                row0[...] = xn[:1, :]

            row_prev[...] = xn[-1:, :]

            if pipelined:
                @pl.when(t >= 2)
                def _():
                    xn_wb(t - 2, p).wait()
            wpxy[p, 0] = xn
            d = xn_wb(t, p)
            d.start()
            if not pipelined:
                d.wait()
            return 0

        jax.lax.fori_loop(0, T, pro_body, 0)
        if pipelined:
            for tt in (T - 2, T - 1):
                xn_wb(tt, tt & 1).wait()
        x0r = row0[...]
        dh0 = x0r - jnp.concatenate([x0r[:, -1:], x0r[:, :-1]], axis=1)
        dv0 = x0r - row_prev[...]
        tvacc[0] = tvacc[0] + jnp.sum(jnp.sqrt(dh0 * dh0 + dv0 * dv0))
        tv_ref[b] = tvacc[0]

    # ---- one streaming pass: up to `limit` sweeps from `src` --------------
    def run_pass(src, limit):
        # SMEM only takes scalar stores — zero the slots one by one
        jax.lax.fori_loop(
            0, K + 1, lambda i, _: (errs.__setitem__(i, 0.0), 0)[1], 0
        )
        if pipelined:
            start_fetch(src, 0, 0)

        def tile_body(t, _):
            p = (t & 1) if pipelined else 0
            if pipelined:
                @pl.when(t + 1 < T)
                def _():
                    start_fetch(src, t + 1, 1 - p)
            else:
                start_fetch(src, t, 0)

            wait_fetch(src, t, p)
            glam_w = buf_g[p] / lam

            def sweep_body(i, carry):
                # restructured for VMEM liveness (r5): u dies before tmp is
                # built, the residual is computed on central-row slices, and
                # tmp dies into denom — at most px/py/upx/upy + one other
                # (W, N) value live at once (the r4 form kept ~8, which
                # compile-OOM'd R = 128 even single-slot).  Every operation
                # is elementwise-identical to the whole-image op, so
                # bit-exactness is preserved.
                px_w, py_w = carry
                u = neumann_div(px_w, py_w) - glam_w
                upx = jnp.concatenate(
                    [u[1:, :] - u[:-1, :], jnp.zeros((1, N), dtype)], axis=0
                )
                upy = jnp.concatenate(
                    [u[:, 1:] - u[:, :-1], jnp.zeros((W, 1), dtype)], axis=1
                )
                tmp = jnp.sqrt(upx * upx + upy * upy)
                # residual over central rows only (the pad rows' values are
                # not part of the global residual); slicing the operands
                # before the arithmetic gives the same elementwise values
                # with (R, N) instead of (W, N) temporaries
                tmp_c = central(tmp, t)
                rx = -central(upx, t) + tmp_c * central(px_w, t)
                ry = -central(upy, t) + tmp_c * central(py_w, t)
                part = jnp.sum(rx * rx + ry * ry)
                errs[i] = errs[i] + part
                denom = 1.0 + tau * tmp
                return (px_w + tau * upx) / denom, (py_w + tau * upy) / denom

            # dynamic trip count: exactly `limit` window sweeps run — a
            # 25-sweep solve costs 25 window sweeps (not ceil(25/K)*K)
            px_w, py_w = jax.lax.fori_loop(
                1, limit + 1, sweep_body, window_duals(src, p)
            )

            dst = jnp.where(src == 0, jnp.int32(1), jnp.int32(0))
            if pipelined:
                @pl.when(t >= 2)
                def _():
                    wait_wb(dst, t - 2, p)

            wpxy[p, 0] = central(px_w, t)
            wpxy[p, 1] = central(py_w, t)
            start_wb(dst, t, p)
            if not pipelined:
                wait_wb(dst, t, 0)
            return 0

        jax.lax.fori_loop(0, T, tile_body, 0)
        if pipelined:
            dst = jnp.where(src == 0, jnp.int32(1), jnp.int32(0))
            wait_wb(dst, T - 2, (T - 2) & 1)
            wait_wb(dst, T - 1, (T - 1) & 1)

    # ---- pass loop with bit-exact early exit ------------------------------
    def pass_cond(carry):
        s0, src, err = carry
        return jnp.logical_and(s0 < max_iter, err > tolv)

    def pass_body(carry):
        s0, src, _ = carry
        limit = jnp.minimum(jnp.int32(K), (jnp.int32(max_iter) - s0)).astype(
            jnp.int32
        )
        run_pass(src, limit)

        # first inner sweep whose global residual hit tol (if any)
        def scan_j(i, jstar):
            hit = jnp.logical_and(
                i <= limit, jnp.sqrt(errs[i]) <= tolv
            )
            return jnp.where(jnp.logical_and(jstar == 0, hit), i, jstar)

        jstar = jax.lax.fori_loop(1, K + 1, scan_j, jnp.int32(0))
        jstop = jnp.where(jstar == 0, limit, jstar)

        # exit fired mid-pass: re-run from the intact src with limit j*
        @pl.when(jnp.logical_and(jstar > 0, jstar < limit))
        def _():
            run_pass(src, jstar)

        dst = jnp.where(src == 0, jnp.int32(1), jnp.int32(0))
        return s0 + jstop, dst, jnp.sqrt(errs[jstop])

    s_final, src_final, err_final = jax.lax.while_loop(
        pass_cond, pass_body,
        (jnp.int32(0), jnp.int32(2), jnp.array(jnp.inf, dtype)),
    )

    # ---- assemble f = g - lam * div(px, py) from the final workspace ------
    # (src_final == 2 only when max_iter == 0 fired no pass: zero duals /
    # the warm input are then the final state and the fetch helpers handle
    # them like any other source)
    if pipelined:
        start_fetch(src_final, 0, 0)

    def asm_body(t, _):
        p = (t & 1) if pipelined else 0
        if pipelined:
            @pl.when(t + 1 < T)
            def _():
                start_fetch(src_final, t + 1, 1 - p)
        else:
            start_fetch(src_final, t, 0)

        wait_fetch(src_final, t, p)
        px_w, py_w = window_duals(src_final, p)
        g_w = buf_g[p]
        div = neumann_div(px_w, py_w)
        f_t = central(g_w - lam * div, t)

        if pipelined:
            @pl.when(t >= 2)
            def _():
                pltpu.make_async_copy(
                    wpxy.at[p, 0], f_ref.at[b, pl.ds((t - 2) * R, R)],
                    wsem.at[p],
                ).wait()

        wpxy[p, 0] = f_t
        d = pltpu.make_async_copy(
            wpxy.at[p, 0], f_ref.at[b, pl.ds(t * R, R)], wsem.at[p]
        )
        d.start()
        if not pipelined:
            # single-slot form: wpxy[0] is re-used next tile — drain now
            # (the two-tile drain below would also index slot 1, which the
            # sync form does not have)
            d.wait()
        return 0

    jax.lax.fori_loop(0, T, asm_body, 0)
    if pipelined:
        for t in (T - 2, T - 1):
            pltpu.make_async_copy(
                wpxy.at[t & 1, 0], f_ref.at[b, pl.ds(t * R, R)], wsem.at[t & 1]
            ).wait()

    # ---- stream the final duals back out (SALSA warm-start state) ---------
    if ret_duals:
        def dual_out_body(t, _):
            p = (t & 1) if pipelined else 0
            # stage the final central rows into wpxy[p] ...
            @pl.when(src_final != 2)
            def _():
                _for_flag(src_final, lambda ref: pltpu.make_async_copy(
                    ref.at[:, pl.ds(t * R, R)], wpxy.at[p], fsem.at[1, p]
                ).start())
                _for_flag(src_final, lambda ref: pltpu.make_async_copy(
                    ref.at[:, pl.ds(t * R, R)], wpxy.at[p], fsem.at[1, p]
                ).wait())

            @pl.when(src_final == 2)
            def _():
                if warm:
                    for which, ref in ((0, pxin_ref), (1, pyin_ref)):
                        d = pltpu.make_async_copy(
                            ref.at[b, pl.ds(t * R, R)], wpxy.at[p, which],
                            fsem.at[2 + which, p],
                        )
                        d.start()
                        d.wait()
                else:
                    wpxy[p] = jnp.zeros((2, R, N), dtype)

            # ... and write them to the px/py outputs (synchronous: this
            # tail is ~2 fields of traffic once per solve)
            for which, ref in ((0, pxout_ref), (1, pyout_ref)):
                d = pltpu.make_async_copy(
                    wpxy.at[p, which], ref.at[b, pl.ds(t * R, R)],
                    wsem.at[p],
                )
                d.start()
                d.wait()
            return 0

        jax.lax.fori_loop(0, T, dual_out_body, 0)

    meta_ref[b, 0] = s_final.astype(jnp.float32)
    meta_ref[b, 1] = err_final.astype(jnp.float32)


def streamed_call(
    inputs,
    g_like: jnp.ndarray,
    *,
    mode: str,
    ret_duals: bool,
    max_iter: int,
    tile_rows: int,
    pipelined: bool,
    interpret: bool,
    positivity: bool = True,
    in_kernel_rng: bool = False,
):
    """Shared pallas_call builder for the streamed-kernel family (the
    prox-only plain/warm forms here and the fused MYULA step in
    ops/fused_step_pallas).  `inputs` is the kernel's input tuple (scal
    last); `g_like` supplies (B, M, N) and dtype.  Returns the raw output
    tuple in kernel order."""
    B, M, N = g_like.shape
    dtype = g_like.dtype
    R = tile_rows
    K = STREAM_SWEEP_BLOCK
    assert M % R == 0 and M // R >= 2 and M >= R + 2 * K, (M, R)
    T = M // R
    W = R + 2 * K
    S = 2 if pipelined else 1
    fused = mode == "fused"
    warm = mode == "warm"

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # trailing SMEM inputs: scal (+ the per-chain PRNG seeds when ikr)
    n_smem = 2 if in_kernel_rng else 1
    in_specs = [any_spec] * (len(inputs) - n_smem) + [smem_spec] * n_smem

    out_shape = []
    out_specs = []
    if fused:
        out_shape.append(jax.ShapeDtypeStruct((B, M, N), dtype))  # xn
        out_specs.append(any_spec)
    out_shape += [
        jax.ShapeDtypeStruct((B, M, N), dtype),      # f
        jax.ShapeDtypeStruct((2, M, N), dtype),      # pxy ping workspace
        jax.ShapeDtypeStruct((2, M, N), dtype),      # pxy pong workspace
    ]
    out_specs += [any_spec, any_spec, any_spec]
    if ret_duals:
        out_shape += [
            jax.ShapeDtypeStruct((B, M, N), dtype),  # px out
            jax.ShapeDtypeStruct((B, M, N), dtype),  # py out
        ]
        out_specs += [any_spec, any_spec]
    if fused:
        out_shape.append(jax.ShapeDtypeStruct((B,), dtype))       # tv
        out_specs.append(smem_spec)
    out_shape.append(jax.ShapeDtypeStruct((B, 2), jnp.float32))   # meta
    out_specs.append(smem_spec)

    scratch = [
        # pipelined=False trades the 2-slot DMA overlap for VMEM,
        # admitting a larger R (the window-ratio lever at >=2048^2)
        pltpu.VMEM((S, W, N), dtype),        # buf_g
        pltpu.VMEM((S, 2, W, N), dtype),     # buf_pxy
        pltpu.VMEM((S, 2, R, N), dtype),     # wpxy
        pltpu.SMEM((K + 1,), dtype),         # per-inner-sweep residuals
        # fetch sems: rows g / packed pxy (+ px_in / py_in when warm)
        pltpu.SemaphoreType.DMA((4 if warm else 2, S)),
        pltpu.SemaphoreType.DMA((S,)),       # writeback sems x slot
    ]
    if fused:
        nm = 3 if in_kernel_rng else 4
        scratch += [
            pltpu.VMEM((S, nm, R, N), dtype),    # mbuf: x/prox/grad[/z] tiles
            pltpu.SemaphoreType.DMA((S, nm)),    # myula fetch sems
            pltpu.SMEM((1,), dtype),             # tv accumulator
            pltpu.VMEM((1, N), dtype),           # row_prev stash
            pltpu.VMEM((1, N), dtype),           # row0 stash
        ]

    return pl.pallas_call(
        partial(_streamed_kernel, max_iter=max_iter, tile_rows=R, n_tiles=T,
                sweep_block=K, pipelined=pipelined, mode=mode,
                ret_duals=ret_duals, positivity=positivity,
                in_kernel_rng=in_kernel_rng),
        grid=(B,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


@partial(jax.jit,
         static_argnames=("max_iter", "tile_rows", "interpret", "pipelined",
                          "return_state"))
def chambolle_prox_streamed(
    g: jnp.ndarray,
    lam,
    max_iter: int,
    tau: float = 0.249,
    tol: float = 1e-3,
    tile_rows: Optional[int] = None,
    interpret: bool = False,
    pipelined: bool = True,
    duals: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    return_state: bool = False,
) -> Tuple[jnp.ndarray, ChambolleState]:
    """Chambolle prox for images whose two whole-image dual fields exceed
    VMEM scratch (>= 2048^2 f32 — where chambolle_prox_tiled caps out):
    the duals live in HBM (ping-pong pair) and row tiles stream through
    VMEM with TEMPORAL BLOCKING — each fetched window runs up to
    STREAM_SWEEP_BLOCK Jacobi sweeps locally before writing back, so HBM
    traffic is ~5/K fields per sweep and the VPU stencil is the bound.
    Same math and per-sweep early exit as ops.tv.chambolle_prox;
    bit-identity is TPU-tested at 2048^2.

    duals=(px, py) warm-starts the dual ascent (the reference 'dualvars'
    option SALSA_v2.m:429 at streamed scale); return_state=True streams the
    final duals back out so SALSA can carry them across outer iterations.
    Without either, the first pass holds the zero duals in-register (no
    zero-prologue writes, no first-pass dual fetch).

    Accepts (M, N) or (B, M, N); chains run sequentially in the grid,
    sharing the HBM dual workspaces.
    """
    squeeze = g.ndim == 2
    if squeeze:
        g = g[None]
    B, M, N = g.shape
    if tile_rows is None:
        itemsize = jnp.dtype(g.dtype).itemsize
        try:
            tile_rows = streamed_tile_rows(M, N, itemsize, pipelined=pipelined)
        except ValueError:
            if not pipelined:
                raise
            # the single-slot form frees ~half the buffer rows — the
            # largest geometries (8192² f32) only fit there
            pipelined = False
            tile_rows = streamed_tile_rows(M, N, itemsize, pipelined=False)
    scal = jnp.stack(
        [jnp.asarray(lam, g.dtype), jnp.asarray(tau, g.dtype),
         jnp.asarray(tol, g.dtype)]
    )
    if duals is not None:
        px0, py0 = duals
        if squeeze:
            px0, py0 = px0[None], py0[None]
        inputs = (g, px0, py0, scal)
        mode = "warm"
    else:
        inputs = (g, scal)
        mode = "plain"

    outs = streamed_call(
        inputs, g, mode=mode, ret_duals=return_state, max_iter=max_iter,
        tile_rows=tile_rows, pipelined=pipelined, interpret=interpret,
    )
    if return_state:
        f, _pxyA, _pxyB, px, py, meta = outs
    else:
        f, _pxyA, _pxyB, meta = outs
        px = py = jnp.zeros_like(f)
    iters = meta[:, 0].astype(jnp.int32)
    err = meta[:, 1].astype(g.dtype)
    if squeeze:
        f, px, py, iters, err = f[0], px[0], py[0], iters[0], err[0]
    return f, ChambolleState(px=px, py=py, iters=iters, err=err)
