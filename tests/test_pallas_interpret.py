"""Pallas kernel math vs the XLA reference path, via interpret mode (CPU).

The real-Mosaic bit-identity checks live in tests/test_tpu_only.py; these
interpret-mode twins keep the kernel logic covered by the default CPU suite
(same jaxpr, no Mosaic lowering).
"""
import jax
import jax.numpy as jnp
import numpy as np

from semiblind_tv_tpu.ops import fourier
from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv, myula_prox_tv_dft
from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_pallas
from semiblind_tv_tpu.samplers.myula import myula_kernel_step


def test_chambolle_interpret_matches_xla_single():
    x = jax.random.normal(jax.random.key(0), (32, 32)) * 10
    f1, st1 = chambolle_prox(x, 0.5, 25)
    f2, st2 = chambolle_prox_pallas(x, 0.5, 25, interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-12, atol=1e-12)
    assert int(st2.iters) <= 25


def test_chambolle_interpret_batched_early_exit():
    B = 3
    xs = jnp.stack([
        jax.random.normal(jax.random.key(i), (32, 32)) * (10.0 ** (i - 1))
        for i in range(B)
    ])
    fb, stb = chambolle_prox_pallas(xs, 0.5, 25, interpret=True)
    assert stb.iters.shape == (B,)
    for i in range(B):
        fi, sti = chambolle_prox(xs[i], 0.5, 25)
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), rtol=1e-12, atol=1e-12)
        assert int(stb.iters[i]) == int(sti.iters)


def test_chambolle_interpret_warm_duals():
    x = jax.random.normal(jax.random.key(5), (24, 24)) * 5
    _, st = chambolle_prox(x, 0.3, 10)
    f1, _ = chambolle_prox(x, 0.3, 10, duals=(st.px, st.py))
    f2, _ = chambolle_prox_pallas(x, 0.3, 10, duals=(st.px, st.py), interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-12, atol=1e-12)


def test_fused_dft_step_interpret_matches_unfused():
    """Whole-iteration kernel (irfft + MYULA + prox + TV + rfft in one
    launch) vs the same composition through ops/fourier + ops/tv."""
    M = N = 32
    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.uniform(ks[0], (2, M, N), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], x.shape, jnp.float32) * 0.1
    z = jax.random.normal(ks[2], x.shape, jnp.float32)
    ghat = fourier.rfft2_matmul(
        jax.random.normal(ks[3], x.shape, jnp.float32),
        fourier.rdft_matrices((M, N), jnp.float32),
    )
    mats = fourier.rdft_matrices((M, N), jnp.float32)
    g, l, lt, s2 = 1.9, 2.0, 0.02, 2.5

    xb, pb, tvb, xhb = myula_prox_tv_dft(
        ghat, x, prox_c, z, mats, g, l, lt, s2, 25, interpret=True
    )
    assert tvb.shape == (2,) and xhb.shape == (2, M, N // 2 + 1)
    for i in range(2):
        gradf = fourier.irfft2_matmul(ghat[i], mats).astype(jnp.float32) / s2
        xr = myula_kernel_step(x[i], prox_c[i], gradf, g, l, z[i], True)
        pr, _ = chambolle_prox(xr, lt, 25)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xr), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(pr), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(tvb[i]), float(tv_norm(xr)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(xhb[i]), np.asarray(fourier.rfft2_matmul(xr, mats)),
            rtol=1e-4, atol=1e-2,
        )


def test_fused_step_interpret_matches_unfused():
    ks = jax.random.split(jax.random.key(1), 4)
    x = jax.random.uniform(ks[0], (3, 32, 32)) * 255
    prox_c = x + jax.random.normal(ks[1], x.shape) * 0.1
    gradf = jax.random.normal(ks[2], x.shape) * 0.01
    z = jax.random.normal(ks[3], x.shape)
    g, l, lt = 1.9, 2.0, 0.02

    xb, pb, tvb = myula_prox_tv(x, prox_c, gradf, z, g, l, lt, 25, interpret=True)
    assert tvb.shape == (3,)
    for i in range(3):
        xr = myula_kernel_step(x[i], prox_c[i], gradf[i], g, l, z[i], True)
        pr, _ = chambolle_prox(xr, lt, 25)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xr), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(pr), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(tvb[i]), float(tv_norm(xr)), rtol=1e-10)


def test_chunked_chain_call_balances_and_discards_padding():
    from semiblind_tv_tpu.ops.tv_pallas import chunked_chain_call

    calls = []

    def run(a, b):
        calls.append(a.shape[0])
        return (a + b, jnp.sum(a, axis=(1, 2)))

    a = jnp.arange(25.0 * 4 * 4).reshape(25, 4, 4)
    b = jnp.ones_like(a)
    s, t = chunked_chain_call(run, (a, b), max_grid=24)
    # B=25 > 24: balanced as 2 chunks of 13 with 1 padded chain dropped
    assert calls == [13]  # traced once by lax.map
    np.testing.assert_allclose(np.asarray(s), np.asarray(a + b))
    np.testing.assert_allclose(np.asarray(t), np.asarray(jnp.sum(a, axis=(1, 2))))
    # B <= max_grid passes straight through (single direct call)
    calls.clear()
    s2, _ = chunked_chain_call(run, (a[:24], b[:24]), max_grid=24)
    assert calls == [24] and s2.shape[0] == 24


def test_chambolle_interpret_chunked_matches_per_chain():
    """B > MAX_GRID_CHAINS runs as sequential sub-grids (the ≥48-chain
    remote-compiler-crash fix) — outputs must match the per-chain XLA op."""
    B = 25  # chunks to 2×13 with one padded chain discarded
    xs = jnp.stack([
        jax.random.normal(jax.random.key(i), (16, 16)) * (1.0 + i / 5.0)
        for i in range(B)
    ])
    fb, stb = chambolle_prox_pallas(xs, 0.5, 10, interpret=True)
    assert fb.shape == (B, 16, 16) and stb.iters.shape == (B,)
    for i in (0, 12, 13, 24):
        fi, sti = chambolle_prox(xs[i], 0.5, 10)
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), rtol=1e-12, atol=1e-12)
        assert int(stb.iters[i]) == int(sti.iters)


def test_chambolle_interpret_lean_fresh_duals():
    """return_state=False (the SAPG fallback form: duals never enter or
    leave the kernel) must produce the same f/iteration counts as the fat
    kernel and the XLA op, including when chain-chunked."""
    import pytest

    B = 25
    xs = jnp.stack([
        jax.random.normal(jax.random.key(100 + i), (16, 16)) * (1.0 + i / 7.0)
        for i in range(B)
    ])
    f_lean, st_lean = chambolle_prox_pallas(
        xs, 0.5, 10, interpret=True, return_state=False
    )
    assert st_lean.iters.shape == (B,)
    np.testing.assert_allclose(np.asarray(st_lean.px), 0.0)
    for i in (0, 12, 24):
        fi, sti = chambolle_prox(xs[i], 0.5, 10)
        np.testing.assert_allclose(np.asarray(f_lean[i]), np.asarray(fi), rtol=1e-12, atol=1e-12)
        assert int(st_lean.iters[i]) == int(sti.iters)
    # single image + early exit
    g2 = jnp.ones((16, 16), jnp.float64)
    f2, st2 = chambolle_prox_pallas(g2, 0.5, 25, interpret=True, return_state=False)
    f2_ref, st2_ref = chambolle_prox(g2, 0.5, 25)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f2_ref), atol=1e-12)
    assert int(st2.iters) == int(st2_ref.iters) < 25
    with pytest.raises(ValueError):
        chambolle_prox_pallas(
            g2, 0.5, 10, duals=(g2, g2), interpret=True, return_state=False
        )


def test_fused_step_interpret_chunked_matches_unfused():
    B = 25
    ks = jax.random.split(jax.random.key(11), 4)
    x = jax.random.uniform(ks[0], (B, 16, 16)) * 255
    prox_c = x + jax.random.normal(ks[1], x.shape) * 0.1
    gradf = jax.random.normal(ks[2], x.shape) * 0.01
    z = jax.random.normal(ks[3], x.shape)
    g, l, lt = 1.9, 2.0, 0.02

    xb, pb, tvb = myula_prox_tv(x, prox_c, gradf, z, g, l, lt, 10, interpret=True)
    assert tvb.shape == (B,)
    for i in (0, 13, 24):
        xr = myula_kernel_step(x[i], prox_c[i], gradf[i], g, l, z[i], True)
        pr, _ = chambolle_prox(xr, lt, 10)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xr), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(pr), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(tvb[i]), float(tv_norm(xr)), rtol=1e-10)


def test_tiled_chambolle_interpret_matches_xla():
    """Row-tiled prox (duals in VMEM scratch, image streamed in row blocks)
    vs the whole-image op: identical f, iteration counts, and early exit."""
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_tiled

    g = jax.random.uniform(jax.random.key(2), (128, 96), jnp.float64) * 255
    for lam in (0.05, 5.0):
        f_ref, st_ref = chambolle_prox(g, lam, 25)
        f_t, st_t = chambolle_prox_tiled(g, lam, 25, tile_rows=32, interpret=True)
        np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_ref), atol=1e-12)
        assert int(st_t.iters) == int(st_ref.iters)
    # early exit fires identically on an easy problem
    g2 = jnp.ones((64, 64), jnp.float64)
    f_ref, st_ref = chambolle_prox(g2, 0.5, 25)
    f_t, st_t = chambolle_prox_tiled(g2, 0.5, 25, tile_rows=16, interpret=True)
    assert int(st_t.iters) == int(st_ref.iters) < 25
    np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_ref), atol=1e-12)


def test_tiled_chambolle_interpret_batched():
    """(B, M, N) tiled prox: chains sequential in the outer grid dim, one
    shared scratch dual pair re-zeroed per chain — per-chain results and
    early-exit counts must match the whole-image op."""
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_tiled

    B = 3
    gs = jnp.stack([
        jax.random.uniform(jax.random.key(20 + i), (64, 48), jnp.float64)
        * (50.0 * (i + 1))
        for i in range(B)
    ])
    fb, stb = chambolle_prox_tiled(gs, 0.8, 25, tile_rows=16, interpret=True)
    assert fb.shape == gs.shape and stb.iters.shape == (B,)
    for i in range(B):
        fi, sti = chambolle_prox(gs[i], 0.8, 25)
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), atol=1e-12)
        assert int(stb.iters[i]) == int(sti.iters)


def test_streamed_chambolle_interpret_matches_xla():
    """HBM-streamed-dual prox (manual double-buffered DMA, duals in HBM —
    the >=2048^2 form) vs the whole-image op: identical f, iteration
    counts, and early exit, single and batched."""
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_streamed

    g = jax.random.uniform(jax.random.key(2), (128, 96), jnp.float64) * 255
    for lam in (0.05, 5.0):
        f_ref, st_ref = chambolle_prox(g, lam, 25)
        f_s, st_s = chambolle_prox_streamed(
            g, lam, 25, tile_rows=32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_ref), atol=1e-12)
        assert int(st_s.iters) == int(st_ref.iters)
    # early exit fires identically (true while_loop: converged sweeps are
    # not streamed at all)
    g2 = jnp.ones((64, 64), jnp.float64)
    f_ref, st_ref = chambolle_prox(g2, 0.5, 25)
    f_s, st_s = chambolle_prox_streamed(g2, 0.5, 25, tile_rows=16, interpret=True)
    assert int(st_s.iters) == int(st_ref.iters) < 25
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_ref), atol=1e-12)
    # batched: chains sequential in the grid, shared HBM dual pair
    B = 3
    gs = jnp.stack([
        jax.random.uniform(jax.random.key(20 + i), (64, 48), jnp.float64)
        * (50.0 * (i + 1))
        for i in range(B)
    ])
    fb, stb = chambolle_prox_streamed(gs, 0.8, 25, tile_rows=16, interpret=True)
    assert fb.shape == gs.shape and stb.iters.shape == (B,)
    for i in range(B):
        fi, sti = chambolle_prox(gs[i], 0.8, 25)
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), atol=1e-12)
        assert int(stb.iters[i]) == int(sti.iters)
    # single-slot synchronous-DMA form (pipelined=False — the VMEM-trade
    # knob) is the same math
    f_sync, st_sync = chambolle_prox_streamed(
        g, 0.05, 25, tile_rows=32, interpret=True, pipelined=False
    )
    f_ref, st_ref = chambolle_prox(g, 0.05, 25)
    np.testing.assert_allclose(np.asarray(f_sync), np.asarray(f_ref), atol=1e-12)
    assert int(st_sync.iters) == int(st_ref.iters)


def test_tiled_fused_step_interpret_matches_unfused():
    """Row-tiled fused MYULA+prox+TV (xn and duals in VMEM scratch, gated
    I/O index maps) vs the unfused composition — identical fields, TV, and
    early-exit behavior, batched and single-image."""
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_tiled

    B, M, N = 3, 64, 48
    x = jax.random.uniform(jax.random.key(31), (B, M, N), jnp.float64) * 100
    prox_c = jax.random.uniform(jax.random.key(32), (B, M, N), jnp.float64) * 100
    gradf = jax.random.normal(jax.random.key(33), (B, M, N), jnp.float64)
    z = jax.random.normal(jax.random.key(34), (B, M, N), jnp.float64)
    g, l, lt = 0.03, 0.9, 0.04

    xn, f, tv = myula_prox_tv_tiled(
        x, prox_c, gradf, z, g, l, lt, n_sweeps=25, tile_rows=16, interpret=True
    )
    assert tv.shape == (B,)
    for i in range(B):
        xr = myula_kernel_step(x[i], prox_c[i], gradf[i], g, l, z[i], True)
        pr, _ = chambolle_prox(xr, lt, 25)
        np.testing.assert_allclose(np.asarray(xn[i]), np.asarray(xr), atol=1e-12)
        np.testing.assert_allclose(np.asarray(f[i]), np.asarray(pr), atol=1e-12)
        np.testing.assert_allclose(float(tv[i]), float(tv_norm(xr)), rtol=1e-10)

    # single-image squeeze path + early exit on an easy problem
    x1 = jnp.ones((32, 32), jnp.float64) * 5
    xn1, f1, tv1 = myula_prox_tv_tiled(
        x1, x1, jnp.zeros_like(x1), jnp.zeros_like(x1), g, l, 0.5,
        n_sweeps=25, tile_rows=8, interpret=True,
    )
    pr1, st1 = chambolle_prox(np.asarray(xn1), 0.5, 25)
    assert int(st1.iters) < 25  # reference exits early; fields must agree
    np.testing.assert_allclose(np.asarray(f1), np.asarray(pr1), atol=1e-12)


def test_streamed_chambolle_warm_duals_and_state():
    """Warm-started streamed prox (SALSA's >=2048^2 form): duals in,
    final duals out — identical to the whole-image op's 'dualvars' path
    (reference SALSA/SALSA_v2.m:429), single + batched + early exit."""
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_streamed

    g = jax.random.uniform(jax.random.key(40), (128, 96), jnp.float64) * 255
    _, st0 = chambolle_prox(g, 0.4, 7)
    f_ref, st_ref = chambolle_prox(g, 0.4, 10, duals=(st0.px, st0.py))
    f_s, st_s = chambolle_prox_streamed(
        g, 0.4, 10, tile_rows=32, interpret=True,
        duals=(st0.px, st0.py), return_state=True,
    )
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.px), np.asarray(st_ref.px), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.py), np.asarray(st_ref.py), atol=1e-12)
    assert int(st_s.iters) == int(st_ref.iters)

    # warm start on an already-converged problem: early exit fires on the
    # first sweeps and the input duals round-trip through the state output
    ge = jnp.ones((64, 64), jnp.float64)
    _, ste = chambolle_prox(ge, 0.5, 25)
    f_ref, st_ref = chambolle_prox(ge, 0.5, 25, duals=(ste.px, ste.py))
    f_s, st_s = chambolle_prox_streamed(
        ge, 0.5, 25, tile_rows=16, interpret=True,
        duals=(ste.px, ste.py), return_state=True,
    )
    assert int(st_s.iters) == int(st_ref.iters)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.px), np.asarray(st_ref.px), atol=1e-12)

    # batched warm start (chains sequential, shared HBM workspaces) +
    # single-slot sync form
    B = 2
    gs = jnp.stack([g[:64, :64], g[64:, :64] * 0.5])
    d0 = [chambolle_prox(gs[i], 0.8, 5)[1] for i in range(B)]
    px0 = jnp.stack([d.px for d in d0])
    py0 = jnp.stack([d.py for d in d0])
    for pipelined in (True, False):
        fb, stb = chambolle_prox_streamed(
            gs, 0.8, 10, tile_rows=16, interpret=True,
            duals=(px0, py0), return_state=True, pipelined=pipelined,
        )
        for i in range(B):
            fi, sti = chambolle_prox(gs[i], 0.8, 10, duals=(d0[i].px, d0[i].py))
            np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), atol=1e-12)
            np.testing.assert_allclose(np.asarray(stb.px[i]), np.asarray(sti.px), atol=1e-12)
            assert int(stb.iters[i]) == int(sti.iters)


def test_streamed_fused_step_interpret_matches_unfused():
    """HBM-streamed fused MYULA+prox+TV (the >=2048^2 SAPG step) vs the
    unfused composition — identical fields, TV, early exit; batched,
    squeeze, and single-slot forms."""
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_streamed

    B, M, N = 2, 96, 64
    ks = jax.random.split(jax.random.key(50), 4)
    x = jax.random.uniform(ks[0], (B, M, N), jnp.float64) * 100
    prox_c = x + jax.random.normal(ks[1], (B, M, N)) * 0.1
    graw = jax.random.normal(ks[2], (B, M, N))  # unscaled gradF
    z = jax.random.normal(ks[3], (B, M, N))
    g, l, lt, s2 = 0.03, 0.9, 0.04, 2.5

    xn, f, tv = myula_prox_tv_streamed(
        x, prox_c, graw, z, g, l, lt, s2, n_sweeps=25, tile_rows=32,
        interpret=True,
    )
    assert tv.shape == (B,)
    for i in range(B):
        xr = myula_kernel_step(x[i], prox_c[i], graw[i] / s2, g, l, z[i], True)
        pr, _ = chambolle_prox(xr, lt, 25)
        np.testing.assert_allclose(np.asarray(xn[i]), np.asarray(xr), atol=1e-12)
        np.testing.assert_allclose(np.asarray(f[i]), np.asarray(pr), atol=1e-12)
        np.testing.assert_allclose(float(tv[i]), float(tv_norm(xr)), rtol=1e-10)

    # squeeze path, no positivity, sync-DMA form
    xn1, f1, tv1 = myula_prox_tv_streamed(
        x[0], prox_c[0], graw[0], z[0], g, l, lt, s2, n_sweeps=10,
        tile_rows=16, interpret=True, positivity=False, pipelined=False,
    )
    xr1 = myula_kernel_step(x[0], prox_c[0], graw[0] / s2, g, l, z[0], False)
    pr1, _ = chambolle_prox(xr1, lt, 10)
    np.testing.assert_allclose(np.asarray(xn1), np.asarray(xr1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(pr1), atol=1e-12)
    np.testing.assert_allclose(float(tv1), float(tv_norm(xr1)), rtol=1e-10)

    # early exit parity on an easy problem (exercises the mid-pass redo
    # with the fused xn workspace as the g source)
    xe = jnp.ones((64, 64), jnp.float64) * 5
    ze = jnp.zeros_like(xe)
    xne, fe, tve = myula_prox_tv_streamed(
        xe, xe, ze, ze, g, l, 0.5, 1.0, n_sweeps=25, tile_rows=16,
        interpret=True,
    )
    xre = myula_kernel_step(xe, xe, ze, g, l, ze, True)
    pre, ste = chambolle_prox(xre, 0.5, 25)
    assert int(ste.iters) < 25
    np.testing.assert_allclose(np.asarray(fe), np.asarray(pre), atol=1e-12)


def test_tiled_chambolle_warm_duals_and_state():
    """Warm-started tiled prox (SALSA's 1024² form): duals in via the
    load phase, converged duals out at assembly — identical to the
    whole-image op's 'dualvars' path, single + batched."""
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_tiled

    g = jax.random.uniform(jax.random.key(60), (64, 48), jnp.float64) * 255
    _, st0 = chambolle_prox(g, 0.4, 7)
    f_ref, st_ref = chambolle_prox(g, 0.4, 10, duals=(st0.px, st0.py))
    f_t, st_t = chambolle_prox_tiled(
        g, 0.4, 10, tile_rows=16, interpret=True, duals=(st0.px, st0.py)
    )
    np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_t.px), np.asarray(st_ref.px), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_t.py), np.asarray(st_ref.py), atol=1e-12)
    assert int(st_t.iters) == int(st_ref.iters)

    # batched warm start
    B = 2
    gs = jnp.stack([g, g * 0.5])
    d0 = [chambolle_prox(gs[i], 0.8, 5)[1] for i in range(B)]
    fb, stb = chambolle_prox_tiled(
        gs, 0.8, 10, tile_rows=16, interpret=True,
        duals=(jnp.stack([d.px for d in d0]), jnp.stack([d.py for d in d0])),
    )
    for i in range(B):
        fi, sti = chambolle_prox(gs[i], 0.8, 10, duals=(d0[i].px, d0[i].py))
        np.testing.assert_allclose(np.asarray(fb[i]), np.asarray(fi), atol=1e-12)
        np.testing.assert_allclose(np.asarray(stb.px[i]), np.asarray(sti.px), atol=1e-12)
        assert int(stb.iters[i]) == int(sti.iters)
