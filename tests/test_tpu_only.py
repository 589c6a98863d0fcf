"""Tests that require a real TPU backend (skipped on the CPU CI mesh).

Run manually on the chip:  python -m pytest tests/test_tpu_only.py -q
(without the conftest CPU forcing: JAX_TPU_TESTS=1 env opts in)
"""
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("JAX_TPU_TESTS") != "1",
    reason="set JAX_TPU_TESTS=1 and run on a TPU backend",
)


@requires_tpu
def test_fused_step_bit_identical():
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.uniform(ks[0], (256, 256), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], (256, 256)) * 0.1
    gradf = jax.random.normal(ks[2], (256, 256)) * 0.01
    z = jax.random.normal(ks[3], (256, 256))
    g, l, lt = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02)

    xn_f, proxn_f, tv_f = myula_prox_tv(x, prox_c, gradf, z, g, l, lt, 25)
    xn_r = myula_kernel_step(x, prox_c, gradf, g, l, z, True)
    proxn_r, _ = chambolle_prox(xn_r, lt, 25)
    assert float(jnp.max(jnp.abs(xn_f - xn_r))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_f - proxn_r))) == 0.0
    np.testing.assert_allclose(float(tv_f), float(tv_norm(xn_r)), rtol=1e-5)


@requires_tpu
def test_pallas_chambolle_bit_identical():
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_pallas

    x = jax.random.normal(jax.random.key(0), (256, 256), jnp.float32) * 10
    f1, st1 = chambolle_prox(x, jnp.float32(0.5), 25)
    f2, st2 = chambolle_prox_pallas(x, jnp.float32(0.5), 25)
    assert float(jnp.max(jnp.abs(f1 - f2))) == 0.0


@requires_tpu
def test_pallas_chambolle_batched_grid():
    """(B, M, N) input = grid of B programs; each chain bit-equal to its own
    single-image solve (independent early exits per program)."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_pallas

    B = 4
    # very different scales so the chains exit the masked loop at
    # different sweeps
    xs = jnp.stack([
        jax.random.normal(jax.random.key(i), (256, 256), jnp.float32) * (10.0 ** (i - 1))
        for i in range(B)
    ])
    fb, stb = chambolle_prox_pallas(xs, jnp.float32(0.5), 25)
    assert fb.shape == xs.shape and stb.iters.shape == (B,)
    for i in range(B):
        fi, sti = chambolle_prox_pallas(xs[i], jnp.float32(0.5), 25)
        assert float(jnp.max(jnp.abs(fb[i] - fi))) == 0.0
        assert int(stb.iters[i]) == int(sti.iters)


@requires_tpu
def test_fused_step_batched_grid():
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv

    B = 3
    ks = jax.random.split(jax.random.key(1), 4)
    x = jax.random.uniform(ks[0], (B, 256, 256), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], x.shape) * 0.1
    gradf = jax.random.normal(ks[2], x.shape) * 0.01
    z = jax.random.normal(ks[3], x.shape)
    g, l, lt = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02)

    xb, pb, tvb = myula_prox_tv(x, prox_c, gradf, z, g, l, lt, 25)
    assert tvb.shape == (B,)
    for i in range(B):
        xi, pi, tvi = myula_prox_tv(x[i], prox_c[i], gradf[i], z[i], g, l, lt, 25)
        assert float(jnp.max(jnp.abs(xb[i] - xi))) == 0.0
        assert float(jnp.max(jnp.abs(pb[i] - pi))) == 0.0
        np.testing.assert_allclose(float(tvb[i]), float(tvi), rtol=1e-6)


@requires_tpu
def test_pallas_options_run_through_estimator_multichain():
    """use_pallas_prox / use_fused_step must work at n_chains > 1 through the
    full SAPG step (regression: vmapped pallas_call used to crash here)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.sapg.estimator import make_sapg_step
    from semiblind_tv_tpu.utils import synthetic_wheel

    for mods in ({"use_pallas_prox": True}, {"use_fused_step": True}):
        cfg = gaussian_preset(fix_w1=False, fix_w2=False)
        cfg = dataclasses.replace(cfg, sapg=dataclasses.replace(cfg.sapg, **mods))
        problem = build_problem(synthetic_wheel(256), cfg, jax.random.key(0),
                                dtype=jnp.float32)
        step, aux = make_sapg_step(problem, n_chains=4)
        theta0 = jnp.float32(cfg.theta.init)
        sigma0 = problem.sigma2_init.astype(jnp.float32)
        params0 = {k: jnp.float32(v) for k, v in cfg.init_psf_params().items()}
        X0 = jnp.broadcast_to(problem.y, (4, 256, 256))
        prox0, _ = aux["prox_b"](X0, aux["lam"] * theta0)
        keys = jax.random.split(jax.random.key(1), 4)
        carry = (X0, jnp.fft.rfft2(X0), prox0, keys, theta0, sigma0, params0, {})
        (carry2, trace) = jax.jit(step)(carry, jnp.float32(2.0))
        assert np.isfinite(float(trace["logPi"]))


@requires_tpu
def test_fused_dft_step_matches_xla_composition():
    """Whole-iteration kernel (myula_prox_tv_dft) vs the same composition
    through ops/fourier matmul-DFTs on the real Mosaic backend (256²; the
    512² single-kernel is documented as over the Mosaic resource budget —
    RESULTS.md r2)."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops import fourier
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_dft
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    M = N = 256
    mats = fourier.rdft_matrices((M, N), jnp.float32)
    ks = jax.random.split(jax.random.key(2), 4)
    x = jax.random.uniform(ks[0], (M, N), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], x.shape) * 0.1
    z = jax.random.normal(ks[3], x.shape)
    g, l, lt, s2 = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02), jnp.float32(2.5)

    @jax.jit
    def make_ghat(v):
        return fourier.rfft2_matmul(v, mats)

    ghat = make_ghat(jax.random.normal(ks[2], x.shape) * 0.1)
    xn, proxn, tv, xhat = myula_prox_tv_dft(ghat, x, prox_c, z, mats, g, l, lt, s2, 25)

    @jax.jit
    def ref(ghat, x, prox_c, z):
        gradf = fourier.irfft2_matmul(ghat, mats).astype(jnp.float32) / s2
        xr = myula_kernel_step(x, prox_c, gradf, g, l, z, True)
        pr, _ = chambolle_prox(xr, lt, 25)
        return xr, pr, tv_norm(xr), fourier.rfft2_matmul(xr, mats)

    xr, pr, tvr, xhr = ref(ghat, x, prox_c, z)
    scale = float(jnp.max(jnp.abs(xr)))
    assert float(jnp.max(jnp.abs(xn - xr))) < 1e-4 * scale
    assert float(jnp.max(jnp.abs(proxn - pr))) < 1e-4 * scale
    np.testing.assert_allclose(float(tv), float(tvr), rtol=1e-4)
    assert float(jnp.max(jnp.abs(xhat - xhr))) < 1e-2 * float(jnp.max(jnp.abs(xhr)))


@requires_tpu
def test_operating_point_bands_laplace_wheel():
    """Full-budget 512² Laplace band at the REFERENCE operating point
    (wheel.png, BSNR 30) — the CI-scale statistical tests run at 64²
    (tests/test_statistical.py); this one asserts the real thing on chip
    (~90 s post-compile).  Bands from the 9-photograph parity table
    (RESULTS.md): b_EB within ±0.08 of truth, σ² within 6%, ≥4 dB gain."""
    import jax
    import jax.numpy as jnp
    import dataclasses as dc

    from semiblind_tv_tpu.cli.run_demo import run_demo
    from semiblind_tv_tpu.runtime import laplace_preset
    from semiblind_tv_tpu.utils import load_image

    cfg = laplace_preset()
    cfg = dc.replace(cfg, image="wheel")
    results, *_ = run_demo(cfg, load_image("wheel"), n_chains=1, dtype=jnp.float32)
    assert abs(results["psf_params_EB"]["b"] - 0.3) < 0.08
    assert abs(np.log(results["sigma2_EB"] / results["sigma2_true"])) < 0.06
    assert results["mse_db"] < results["mse_db_observation"] - 4.0


@requires_tpu
def test_operating_point_bands_gaussian_wheel():
    """Full-budget 512² Gaussian band, published configuration (w pinned —
    run_Gaussian_demo.m:42-43), wheel.png at BSNR 30.  Bands from the
    8-photograph parity table (RESULTS.md: σ²_EB −1.8%, θ_EB 0.0209,
    6.6 dB gain): σ² within 8%, θ in the cross-image band, ≥4 dB gain."""
    import jax.numpy as jnp
    import dataclasses as dc

    from semiblind_tv_tpu.cli.run_demo import run_demo
    from semiblind_tv_tpu.runtime import gaussian_preset
    from semiblind_tv_tpu.utils import load_image

    cfg = gaussian_preset()
    cfg = dc.replace(cfg, image="wheel")
    results, *_ = run_demo(cfg, load_image("wheel"), n_chains=1, dtype=jnp.float32)
    assert abs(np.log(results["sigma2_EB"] / results["sigma2_true"])) < 0.08
    assert 0.01 < results["theta_EB"] < 0.04
    assert results["mse_db"] < results["mse_db_observation"] - 4.0


@requires_tpu
def test_operating_point_bands_moffat_wheel():
    """Full-budget 512² Moffat band (θ, α, β, σ² jointly estimated),
    wheel.png at BSNR 30.  Bands from the 9-photograph parity table
    (RESULTS.md: α_EB 0.429, σ²_EB −0.7%, 6.4 dB gain): α within 0.06 of
    truth, σ² within 8%, ≥4 dB gain.  β is deliberately NOT asserted —
    it is the weakly-identified axis (α–β profile degeneracy plus the
    reference's α-gradient factor-2 quirk; certified separately by the
    NumPy dynamics oracle, benchmarks/oracle_dynamics.py)."""
    import jax.numpy as jnp
    import dataclasses as dc

    from semiblind_tv_tpu.cli.run_demo import run_demo
    from semiblind_tv_tpu.runtime import moffat_preset
    from semiblind_tv_tpu.utils import load_image

    cfg = moffat_preset()
    cfg = dc.replace(cfg, image="wheel")
    results, *_ = run_demo(cfg, load_image("wheel"), n_chains=1, dtype=jnp.float32)
    assert abs(results["psf_params_EB"]["alpha"] - 0.4) < 0.06
    assert abs(np.log(results["sigma2_EB"] / results["sigma2_true"])) < 0.08
    assert results["mse_db"] < results["mse_db_observation"] - 4.0


@requires_tpu
def test_in_kernel_rng_statistics_and_determinism():
    """myula_prox_tv_rng (hardware-PRNG Box–Muller noise): with x = prox =
    grad = 0 and γ = 0.5 the MYULA update reduces to xn = z, exposing the
    raw normal field — check its moments, seed determinism, and that the
    batched grid matches per-chain single runs bit-exactly."""
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_rng

    M = N = 256
    zero = jnp.zeros((M, N), jnp.float32)
    g, l, lt = jnp.float32(0.5), jnp.float32(1.0), jnp.float32(0.02)
    seeds = jnp.array([123, 456], jnp.int32)

    def draw(s, z2d=zero):
        xn, _, _ = myula_prox_tv_rng(
            z2d, jnp.zeros_like(z2d), jnp.zeros_like(z2d), s, g, l, lt,
            n_sweeps=1, positivity=False,
        )
        return xn

    xn = draw(seeds)
    n = M * N
    assert abs(float(jnp.mean(xn))) < 5.0 / np.sqrt(n)
    assert abs(float(jnp.var(xn)) - 1.0) < 0.05
    assert abs(float(jnp.mean(xn**3))) < 0.1          # skewness ≈ 0
    assert abs(float(jnp.mean(xn**4)) - 3.0) < 0.3    # kurtosis ≈ 3
    # same seeds → bit-identical; different seeds → different field
    assert float(jnp.max(jnp.abs(draw(seeds) - xn))) == 0.0
    assert float(jnp.max(jnp.abs(draw(seeds + 1) - xn))) > 0.1

    # batched grid: each program seeds from its own row and matches the
    # single-chain run bit-exactly
    sb = jnp.array([[11, 22], [123, 456]], jnp.int32)
    zb = jnp.zeros((2, M, N), jnp.float32)
    xb, _, _ = myula_prox_tv_rng(
        zb, zb, zb, sb, g, l, lt, n_sweeps=1, positivity=False
    )
    for i in range(2):
        assert float(jnp.max(jnp.abs(xb[i] - draw(sb[i])))) == 0.0
    assert float(jnp.max(jnp.abs(xb[0] - xb[1]))) > 0.1


@requires_tpu
def test_in_kernel_rng_through_estimator():
    """in_kernel_rng=True runs the full SAPG step (fused kernel + seed
    plumbing) and produces finite traces at n_chains > 1."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.sapg.estimator import make_sapg_step
    from semiblind_tv_tpu.utils import synthetic_wheel

    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    cfg = dataclasses.replace(
        cfg,
        # fuse_dft=False: at 256²/B=2 the one-kernel auto would win the
        # dispatch and bypass the in-kernel-RNG path under test
        sapg=dataclasses.replace(
            cfg.sapg, use_fused_step=True, in_kernel_rng=True, fuse_dft=False
        ),
    )
    problem = build_problem(synthetic_wheel(256), cfg, jax.random.key(0),
                            dtype=jnp.float32)
    step, aux = make_sapg_step(problem, n_chains=2)
    theta0 = jnp.float32(cfg.theta.init)
    sigma0 = problem.sigma2_init.astype(jnp.float32)
    params0 = {k: jnp.float32(v) for k, v in cfg.init_psf_params().items()}
    X0 = jnp.broadcast_to(problem.y, (2, 256, 256))
    prox0, _ = aux["prox_b"](X0, aux["lam"] * theta0)
    keys = jax.random.split(jax.random.key(1), 2)
    carry = (X0, jnp.fft.rfft2(X0), prox0, keys, theta0, sigma0, params0, {})
    carry2, trace = jax.jit(step)(carry, jnp.float32(2.0))
    assert np.isfinite(float(trace["logPi"]))
    # the step consumed real noise: the chains moved and differ
    assert float(jnp.max(jnp.abs(carry2[0][0] - carry2[0][1]))) > 1e-3


@requires_tpu
def test_tiled_chambolle_bit_identical_1024():
    """Row-tiled prox kernel vs the XLA op at 1024² on the real chip
    (the whole-image kernel cannot compile at this size)."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_tiled

    g = jax.random.uniform(jax.random.key(0), (1024, 1024), jnp.float32) * 255
    f_ref, st_ref = chambolle_prox(g, jnp.float32(0.05), 25)
    f_t, st_t = chambolle_prox_tiled(g, jnp.float32(0.05), 25, tile_rows=128)
    assert float(jnp.max(jnp.abs(f_t - f_ref))) == 0.0
    assert int(st_t.iters) == int(st_ref.iters)


@requires_tpu
def test_streamed_chambolle_bit_identical_2048():
    """HBM-streamed temporally-blocked prox kernel vs the XLA op at 2048²
    on the real chip (the VMEM-scratch tiled kernel cannot compile at this
    size — its two whole-image dual fields exceed scratch).  Single and
    batched, plus early-exit parity on an easy problem."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_streamed

    g = jax.random.uniform(jax.random.key(0), (2048, 2048), jnp.float32) * 255
    f_ref, st_ref = chambolle_prox(g, jnp.float32(0.05), 25)
    f_s, st_s = chambolle_prox_streamed(g, jnp.float32(0.05), 25)
    assert float(jnp.max(jnp.abs(f_s - f_ref))) == 0.0
    assert int(st_s.iters) == int(st_ref.iters)
    # batched: chains sequential in the grid, shared HBM dual workspaces
    gb = jnp.stack([g, g * 0.5])
    fb, stb = chambolle_prox_streamed(gb, jnp.float32(0.05), 25)
    for i in range(2):
        fr, sr = chambolle_prox(gb[i], jnp.float32(0.05), 25)
        assert float(jnp.max(jnp.abs(fb[i] - fr))) == 0.0
        assert int(stb.iters[i]) == int(sr.iters)
    # early exit fires identically (exercises the mid-pass redo path)
    ge = jnp.ones((2048, 2048), jnp.float32)
    f_ref, st_ref = chambolle_prox(ge, jnp.float32(0.5), 25)
    f_s, st_s = chambolle_prox_streamed(ge, jnp.float32(0.5), 25)
    assert int(st_s.iters) == int(st_ref.iters) < 25
    assert float(jnp.max(jnp.abs(f_s - f_ref))) == 0.0


@requires_tpu
def test_tiled_fused_step_bit_identical_1024():
    """Row-tiled fused MYULA+prox+TV kernel vs the unfused XLA composition
    at 1024² on the real chip (the whole-image fused kernel cannot compile
    at this size)."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_tiled
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.uniform(ks[0], (1024, 1024), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], (1024, 1024)) * 0.1
    gradf = jax.random.normal(ks[2], (1024, 1024)) * 0.01
    z = jax.random.normal(ks[3], (1024, 1024))
    g, l, lt = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02)

    xn_f, proxn_f, tv_f = myula_prox_tv_tiled(x, prox_c, gradf, z, g, l, lt, 25)
    xn_r = myula_kernel_step(x, prox_c, gradf, g, l, z, True)
    proxn_r, _ = chambolle_prox(xn_r, lt, 25)
    assert float(jnp.max(jnp.abs(xn_f - xn_r))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_f - proxn_r))) == 0.0
    np.testing.assert_allclose(float(tv_f), float(tv_norm(xn_r)), rtol=1e-5)

    # chain-batched form: chains sequential in the outer grid dim
    xb = jnp.stack([x, x * 0.5])
    xn_b, proxn_b, tv_b = myula_prox_tv_tiled(
        jnp.stack([x, x * 0.5]), jnp.stack([prox_c, prox_c * 0.5]),
        jnp.stack([gradf, gradf]), jnp.stack([z, z]), g, l, lt, 25
    )
    assert float(jnp.max(jnp.abs(xn_b[0] - xn_f))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_b[0] - proxn_f))) == 0.0


@requires_tpu
def test_streamed_fused_step_bit_identical_2048():
    """HBM-streamed fused MYULA+prox+TV kernel (the r5 one-launch 2048²
    spatial segment) vs the unfused XLA composition on the real chip."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_streamed
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    ks = jax.random.split(jax.random.key(7), 4)
    M = 2048
    x = jax.random.uniform(ks[0], (M, M), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], (M, M)) * 0.1
    graw = jax.random.normal(ks[2], (M, M)) * 0.01
    z = jax.random.normal(ks[3], (M, M))
    g, l, lt, s2 = (jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02),
                    jnp.float32(2.5))

    xn_f, proxn_f, tv_f = myula_prox_tv_streamed(
        x, prox_c, graw, z, g, l, lt, s2, 25
    )
    xn_r = myula_kernel_step(x, prox_c, graw / s2, g, l, z, True)
    proxn_r, _ = chambolle_prox(xn_r, lt, 25)
    assert float(jnp.max(jnp.abs(xn_f - xn_r))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_f - proxn_r))) == 0.0
    np.testing.assert_allclose(float(tv_f), float(tv_norm(xn_r)), rtol=1e-5)

    # chain-batched form shares the HBM workspaces sequentially
    xb, pb, gb, zb = (jnp.stack([a, a * 0.5]) for a in (x, prox_c, graw, z))
    xn_b, proxn_b, tv_b = myula_prox_tv_streamed(xb, pb, gb, zb, g, l, lt, s2, 25)
    assert float(jnp.max(jnp.abs(xn_b[0] - xn_f))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_b[0] - proxn_f))) == 0.0


@requires_tpu
def test_streamed_chambolle_bit_identical_4096_r32():
    """Streamed prox at the R=32 geometry the 4096² demo actually runs
    (VERDICT r4 weak #4: the 2048² identity test covers R=64 only) — one
    batched solve at 4096², plus the warm-dual form at the same geometry."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_streamed, streamed_tile_rows

    assert streamed_tile_rows(4096, 4096) == 32
    M = 4096
    g = jax.random.uniform(jax.random.key(0), (M, M), jnp.float32) * 255
    lam = jnp.float32(0.05)
    f_ref, st_ref = chambolle_prox(g, lam, 25)
    f_s, st_s = chambolle_prox_streamed(g, lam, 25)
    assert float(jnp.max(jnp.abs(f_s - f_ref))) == 0.0
    assert int(st_s.iters) == int(st_ref.iters)

    # warm-dual + state round trip at the same geometry (SALSA's 4096² form)
    _, st7 = chambolle_prox(g, lam, 7)
    f_w, st_w = chambolle_prox_streamed(
        g, lam, 10, duals=(st7.px, st7.py), return_state=True
    )
    f_rw, st_rw = chambolle_prox(g, lam, 10, duals=(st7.px, st7.py))
    assert float(jnp.max(jnp.abs(f_w - f_rw))) == 0.0
    assert float(jnp.max(jnp.abs(st_w.px - st_rw.px))) == 0.0
    assert float(jnp.max(jnp.abs(st_w.py - st_rw.py))) == 0.0


@requires_tpu
def test_salsa_warm_dual_kernels_match_xla():
    """salsa_tv with the size-auto kernel prox (tiled at 1024², streamed at
    2048²) vs the XLA prox on chip (VERDICT r4 #2 — SALSA_v2's defining
    warm start at kernel grade beyond 512²).

    Equality caveat (measured, probe_r5 salsa): per-prox f IS bit-exact
    given the same sweep count, but the early-exit residual is reduced in
    per-tile partial order while the XLA op reduces in XLA's order — a
    BORDERLINE tol crossing can pick a different sweep count, and across
    ~100 warm-started outer iterations such a crossing eventually lands
    (1024²/100 outer: final x still maxdiff 0.0; 2048²/100: maxdiff
    3.6e-2 on O(100)-valued pixels ≈ 3e-4 relative).  The assertion is
    therefore exact at 1024² and tolerance-based at 2048²."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops import psf
    from semiblind_tv_tpu.ops.fourier import BlurOperator
    from semiblind_tv_tpu.solvers.salsa import resolve_salsa_prox_mode, salsa_tv
    from semiblind_tv_tpu.utils import synthetic_wheel

    for M, want_mode in ((1024, "tiled"), (2048, "streamed")):
        blur = BlurOperator((M, M), 7, jnp.float32)
        k = psf.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float32)
        H = blur.otf_host(k)
        assert resolve_salsa_prox_mode(blur) == want_mode
        x = jnp.asarray(synthetic_wheel(M), jnp.float32)
        y = jax.jit(lambda x: blur.apply(x, jnp.asarray(H)))(x)
        y = y + 2.0 * jax.random.normal(jax.random.key(3), (M, M), jnp.float32)

        res_k = salsa_tv(y, H, tau=0.15, mu=0.015, blur=blur,
                         max_iter=25, tol=1e-5, tv_iters=10)
        res_x = salsa_tv(y, H, tau=0.15, mu=0.015, blur=blur,
                         max_iter=25, tol=1e-5, tv_iters=10, use_pallas=False)
        if M == 1024:
            assert float(np.max(np.abs(res_k.x - res_x.x))) == 0.0
        else:
            np.testing.assert_allclose(res_k.x, res_x.x, atol=0.05)
        np.testing.assert_allclose(
            res_k.objective, res_x.objective, rtol=1e-4
        )
        assert abs(res_k.n_iters - res_x.n_iters) <= 1


@requires_tpu
def test_operating_point_4096_smoke():
    """Small-budget 4096² end-to-end smoke (VERDICT r4 weak #4): the
    streamed-fused step at the demo's real geometry must run and the MAP
    reconstruction must beat the observation by a sane margin (the r4
    full 150-sample run measured 18.0 dB gain; this 40-sample smoke gates
    a weaker band)."""
    import dataclasses

    import jax.numpy as jnp

    from semiblind_tv_tpu.cli.run_demo import run_demo
    from semiblind_tv_tpu.runtime import gaussian_preset
    from semiblind_tv_tpu.utils import synthetic_wheel

    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    cfg = dataclasses.replace(
        cfg,
        sapg=dataclasses.replace(cfg.sapg, samples=40, warmup=20, burn_in=32),
        salsa=dataclasses.replace(cfg.salsa, outer_iters=60),
    )
    results, *_ = run_demo(cfg, synthetic_wheel(4096), n_chains=1,
                           dtype=jnp.float32)
    gain = results["mse_db_observation"] - results["mse_db"]
    assert np.isfinite(results["mse_db"])
    assert gain > 5.0, results


@requires_tpu
def test_in_kernel_rng_streamed_2048():
    """in_kernel_rng on the streamed fused kernel (the ≥2048² step): same
    seeds → bit-identical, different seeds → different noise, recovered
    Langevin noise is N(0,1) to sampling error.  Step-level throughput is
    measured NEUTRAL at 2048² (215.3 vs 214.1 chain-iter/s, RESULTS.md
    r5) — the option exists for ladder-wide feature parity with the 512²
    whole-image variant, default off."""
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_streamed

    M = 2048
    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.uniform(ks[0], (M, M), jnp.float32) * 255
    graw = jax.random.normal(ks[2], (M, M)) * 0.01
    seeds = jnp.asarray([12345, 6789], jnp.int32)
    args = (jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02),
            jnp.float32(2.5))
    xn1, f1, tv1 = myula_prox_tv_streamed(x, x, graw, None, *args, 25,
                                          seeds=seeds)
    xn2, *_ = myula_prox_tv_streamed(x, x, graw, None, *args, 25, seeds=seeds)
    xn3, *_ = myula_prox_tv_streamed(x, x, graw, None, *args, 25,
                                     seeds=seeds + 1)
    assert float(jnp.max(jnp.abs(xn1 - xn2))) == 0.0
    assert float(jnp.max(jnp.abs(xn1 - xn3))) > 1.0
    # prox == x ⇒ xn = |x − γ·grad/σ² + √(2γ)·z|; x ≫ 0 so abs is inert
    z = (xn1 - (x - args[0] * (graw / args[3]))) / jnp.sqrt(2.0 * args[0])
    assert abs(float(jnp.mean(z))) < 0.01
    assert abs(float(jnp.std(z)) - 1.0) < 0.01
    assert bool(jnp.isfinite(tv1))


@requires_tpu
def test_operating_point_2048_smoke():
    """Small-budget 2048² end-to-end smoke through the r5 streamed-FUSED
    step (the bit-identity test covers the kernel; this gates the full
    demo pipeline — synthesis → SAPG → warm-dual streamed SALSA → metrics
    — at the size's real auto configuration)."""
    import dataclasses

    import jax.numpy as jnp

    from semiblind_tv_tpu.cli.run_demo import run_demo
    from semiblind_tv_tpu.runtime import gaussian_preset
    from semiblind_tv_tpu.utils import synthetic_wheel

    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    cfg = dataclasses.replace(
        cfg,
        sapg=dataclasses.replace(cfg.sapg, samples=60, warmup=30, burn_in=48),
        salsa=dataclasses.replace(cfg.salsa, outer_iters=80),
    )
    results, *_ = run_demo(cfg, synthetic_wheel(2048), n_chains=1,
                           dtype=jnp.float32)
    gain = results["mse_db_observation"] - results["mse_db"]
    assert np.isfinite(results["mse_db"])
    assert gain > 5.0, results
