"""Benchmark: SAPG iteration throughput + SALSA MAP latency on one chip.

Prints ONE JSON line whose primary metric is the FLAGSHIP configuration —
chain-batched SAPG throughput at 16 chains, 512², fused Pallas step +
matmul-DFT transforms (the framework's headline lever):

  {"metric": "sapg_chain_iters_per_sec_512_c16", "value": N,
   "unit": "chain-iter/s", "vs_baseline": R,
   "single_chain_iters_per_sec": N1, "salsa_map_512_330iter_s": S,
   "cpu_ref_iters_per_sec": C}

The reference publishes no numbers (BASELINE.md), so the baseline is the
per-iteration cost of the reference algorithm measured here, on this host,
with a NumPy implementation of the reference's per-iteration math
(full-spectrum FFT A/Aᵀ + hyper-gradient FFTs + 25-iter Chambolle prox —
the same work MATLAB does per iteration, backed by the same class of
optimized CPU FFT/BLAS).  vs_baseline = flagship_chain_iters_per_sec /
cpu_ref_iters_per_sec.

Env knobs: BENCH_SIZE (512), BENCH_STEPS (200), BENCH_CHAINS (16 flagship),
BENCH_FAST=1 skips the single-chain and SALSA extras.  A persistent XLA
compile cache (.jax_cache/) makes repeat runs start in seconds.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from semiblind_tv_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
FLAGSHIP_CHAINS = int(os.environ.get("BENCH_CHAINS", "16"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "200"))
FAST = os.environ.get("BENCH_FAST", "0") == "1"


def _problem(size=None):
    import dataclasses

    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.utils import synthetic_wheel

    size = SIZE if size is None else size
    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    if os.environ.get("BENCH_FUSED", "0") == "1":
        cfg = dataclasses.replace(
            cfg, sapg=dataclasses.replace(cfg.sapg, use_fused_step=True)
        )
    fft_mode = os.environ.get("BENCH_FFT_MODE")
    if fft_mode:
        cfg = dataclasses.replace(
            cfg, sapg=dataclasses.replace(cfg.sapg, fft_mode=fft_mode)
        )
    return cfg, build_problem(
        synthetic_wheel(size), cfg, jax.random.key(0), dtype=jnp.float32
    )


def _with_ikr(cfg):
    import dataclasses

    return dataclasses.replace(
        cfg, sapg=dataclasses.replace(cfg.sapg, use_fused_step=True, in_kernel_rng=True)
    )


def bench_sapg(cfg, problem, n_chains, n_steps=None):
    """Post-compile steady-state chain-iterations/sec of the SAPG hot loop."""
    from semiblind_tv_tpu.sapg.estimator import make_sapg_step

    n_steps = N_STEPS if n_steps is None else n_steps
    step, aux = make_sapg_step(problem, n_chains=n_chains)

    theta0 = jnp.float32(cfg.theta.init)
    sigma0 = problem.sigma2_init.astype(jnp.float32)
    params0 = {k: jnp.float32(v) for k, v in cfg.init_psf_params().items()}
    X0 = jnp.broadcast_to(problem.y, (n_chains,) + tuple(problem.blur.shape))
    prox0, _ = aux["prox_b"](X0, aux["lam"] * theta0)
    keys = jax.random.split(jax.random.key(1), n_chains)
    Xhat0 = jax.jit(problem.blur.rfft)(X0)  # mode-consistent carry transform
    carry = (X0, Xhat0, prox0, keys, theta0, sigma0, params0, {})

    @jax.jit
    def run(carry):
        iis = jnp.arange(2.0, n_steps + 2.0, dtype=jnp.float32)
        carry, _ = jax.lax.scan(step, carry, iis)
        return carry

    carry = jax.block_until_ready(run(carry))  # compile + warm
    t0 = time.perf_counter()
    carry = jax.block_until_ready(run(carry))
    dt = time.perf_counter() - t0
    return n_steps * n_chains / dt


def bench_salsa(problem):
    """512² MAP solve: 330 fixed outer iterations (the round-1 reference
    point, RESULTS.md), post-compile wall seconds."""
    from semiblind_tv_tpu.solvers import salsa_tv

    def solve():
        return salsa_tv(
            problem.y, problem.H_true,
            tau=0.1 * problem.sigma2_init, mu=0.01, blur=problem.blur,
            max_iter=330, tol=0.0, tv_iters=10, x_true=problem.x_true,
        )

    solve()  # compile
    t0 = time.perf_counter()
    solve()
    return time.perf_counter() - t0


def bench_cpu_reference():
    """Reference per-iteration math in NumPy (MATLAB-equivalent work)."""
    rng = np.random.default_rng(0)
    x = rng.random((SIZE, SIZE)) * 255.0
    y = x + rng.standard_normal((SIZE, SIZE))

    s = 7
    offs = np.arange(s) - (s - 1) / 2.0
    v, u = offs[:, None], offs[None, :]

    def kern(w1, w2):
        f = (w1 * w2) / (2 * np.pi) * np.exp(-(w1**2 * u**2 + w2**2 * v**2) / 2)
        return f / f.sum()

    def otf(k):
        p = np.zeros((SIZE, SIZE))
        p[:s, :s] = k
        return np.fft.fft2(p)

    def chambolle(g, lam, iters):
        px = np.zeros_like(g)
        py = np.zeros_like(g)
        for _ in range(iters):
            un = (
                np.concatenate([px[:1], px[1:-1] - px[:-2], -px[-1:]], 0)
                + np.concatenate([py[:, :1], py[:, 1:-1] - py[:, :-2], -py[:, -1:]], 1)
                - g / lam
            )
            ux = np.concatenate([un[1:] - un[:-1], np.zeros((1, SIZE))], 0)
            uy = np.concatenate([un[:, 1:] - un[:, :-1], np.zeros((SIZE, 1))], 1)
            t = np.sqrt(ux**2 + uy**2)
            px = (px + 0.249 * ux) / (1 + 0.249 * t)
            py = (py + 0.249 * uy) / (1 + 0.249 * t)
        div = np.concatenate([px[:1], px[1:-1] - px[:-2], -px[-1:]], 0) + np.concatenate(
            [py[:, :1], py[:, 1:-1] - py[:, :-2], -py[:, -1:]], 1
        )
        return g - lam * div

    X = y.copy()
    n_iter = max(3, 2000 // (SIZE // 8))  # keep the CPU measurement short
    t0 = time.perf_counter()
    for i in range(n_iter):
        # per-iteration work of SAPG_algorithm_Guassian.m:158-194
        H = otf(kern(0.5, 0.3))
        dH1 = otf(kern(0.51, 0.3))  # gradient-kernel OTF (same cost)
        dH2 = otf(kern(0.5, 0.31))
        AX = np.real(np.fft.ifft2(H * np.fft.fft2(X)))
        gradF = np.real(np.fft.ifft2(np.conj(H) * np.fft.fft2(AX - y)))
        X = np.abs(X - 1e-5 * gradF + 1e-3 * rng.standard_normal((SIZE, SIZE)))
        X = chambolle(X, 0.01, 25)
        r = np.real(np.fft.ifft2(H * np.fft.fft2(X))) - y
        np.sum(np.real(np.fft.ifft2(dH1 * np.fft.fft2(X))) * r)
        np.sum(np.real(np.fft.ifft2(dH2 * np.fft.fft2(X))) * r)
        np.sum(np.sqrt((X - np.roll(X, 1, 0)) ** 2 + (X - np.roll(X, 1, 1)) ** 2))
    dt = time.perf_counter() - t0
    return n_iter / dt


def main():
    cfg, problem = _problem()
    flagship_rate = bench_sapg(cfg, problem, FLAGSHIP_CHAINS)
    extras = {}
    if not FAST:
        extras["single_chain_iters_per_sec"] = round(bench_sapg(cfg, problem, 1), 3)
        extras["salsa_map_512_330iter_s"] = round(bench_salsa(problem), 3)
        if jax.default_backend() in ("tpu", "axon"):
            # opt-in hardware-PRNG noise path (+2.4% measured, RESULTS.md r3;
            # the flagship metric stays the reference-parity noise stream)
            extras["in_kernel_rng_iters_per_sec"] = round(
                bench_sapg(_with_ikr(cfg), problem, FLAGSHIP_CHAINS), 3
            )
        if SIZE == 512 and os.environ.get("BENCH_LADDER", "1") == "1":
            # size-ladder rungs (VERDICT r4 #3/#2): 1024² SAPG at its B=4
            # per-chip ceiling with its own SoL denominator, and the 2048²
            # warm-dual streamed-prox MAP solve — efficiency regressions
            # above the flagship size become driver-visible
            try:
                from benchmarks.roofline import analytic as _ana

                cfg_l, prob_l = _problem(1024)
                rate_l = bench_sapg(cfg_l, prob_l, 4, n_steps=40)
                extras["ladder_1024_c4_iters_per_sec"] = round(rate_l, 3)
                extras["sol_fraction_1024"] = round(
                    rate_l / _ana(1024, 1024)["sol_chain_iters_per_sec"], 4
                )
            except Exception as e:  # never sink the flagship metric
                extras["ladder_1024_error"] = repr(e)[:200]
            try:
                cfg_m, prob_m2 = _problem(2048)
                rate_m = bench_sapg(cfg_m, prob_m2, 2, n_steps=30)
                extras["ladder_2048_c2_iters_per_sec"] = round(rate_m, 3)
                extras["sol_fraction_2048"] = round(
                    rate_m / _ana(2048, 2048)["sol_chain_iters_per_sec"], 4
                )
            except Exception as e:
                extras["ladder_2048_step_error"] = repr(e)[:200]
            try:
                from semiblind_tv_tpu.solvers import salsa_tv

                _, prob_m = _problem(2048)

                def _solve_2048():
                    return salsa_tv(
                        prob_m.y, prob_m.H_true,
                        tau=0.1 * prob_m.sigma2_init, mu=0.01,
                        blur=prob_m.blur, max_iter=100, tol=0.0, tv_iters=10,
                    )

                _solve_2048()  # compile
                t0 = time.perf_counter()
                _solve_2048()
                extras["salsa_map_2048_100iter_s"] = round(
                    time.perf_counter() - t0, 3
                )
            except Exception as e:
                extras["ladder_2048_error"] = repr(e)[:200]
    # median of 3 to stabilise the host-load-sensitive CPU baseline
    cpu_rate = sorted(bench_cpu_reference() for _ in range(3))[1]
    # Analytic speed-of-light denominator (benchmarks/roofline.py): makes
    # round-over-round efficiency regressions driver-visible (VERDICT r3 #5).
    from benchmarks.roofline import analytic

    sol_rate = analytic(SIZE, SIZE)["sol_chain_iters_per_sec"]
    print(
        json.dumps(
            {
                "metric": f"sapg_chain_iters_per_sec_{SIZE}_c{FLAGSHIP_CHAINS}",
                "value": round(flagship_rate, 3),
                "unit": "chain-iter/s",
                "vs_baseline": round(flagship_rate / cpu_rate, 3),
                "cpu_ref_iters_per_sec": round(cpu_rate, 3),
                "sol_chain_iters_per_sec": round(sol_rate, 1),
                "sol_fraction": round(flagship_rate / sol_rate, 4),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
