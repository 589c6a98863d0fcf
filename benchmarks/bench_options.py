"""Kernel-option sweep: SAPG step throughput for XLA vs Pallas variants.

Usage (real TPU):
    BENCH_OPT_CONFIGS="default:8,fused:8,pallas_prox:8" \
        timeout 590 python benchmarks/bench_options.py

Each config is `variant:chains` with variant in {default, fused, onekernel,
irdft, ikr, pallas_prox} optionally prefixed dft_ (matmul-DFT transforms)
and/or fixedw_ (w1/w2 pinned); one JSON line is printed per config.  Configs
run serially in one process (avoid concurrent remote compiles — CLAUDE.md).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "200"))


def measure(variant: str, n_chains: int) -> float:
    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.sapg.estimator import make_sapg_step
    from semiblind_tv_tpu.utils import synthetic_wheel

    fixed_w = variant.startswith("fixedw_")
    if fixed_w:
        variant = variant[len("fixedw_"):]
    cfg = gaussian_preset(fix_w1=fixed_w, fix_w2=fixed_w)
    mods = {}
    if variant.startswith("dft_"):       # e.g. dft_fused, dft_default
        mods["fft_mode"] = "dft"
        variant = variant[len("dft_"):]
    elif variant.startswith("fftm_"):    # force jnp.fft transforms
        mods["fft_mode"] = "fft"
        variant = variant[len("fftm_"):]
    if variant == "fused":
        mods["use_fused_step"] = True
        mods["fuse_dft"] = False
    elif variant == "onekernel":     # whole-iteration kernel incl. DFT matmuls
        mods["use_fused_step"] = True
        mods["fuse_dft"] = True
    elif variant == "irdft":         # two-region split: irfft fused, rfft in XLA
        mods["use_fused_step"] = True
        mods["fuse_dft"] = False
        mods["fuse_irdft"] = True
    elif variant == "ikr":           # fused step with in-kernel hardware-PRNG noise
        mods["use_fused_step"] = True
        mods["in_kernel_rng"] = True
    elif variant == "ikr_auto":      # in-kernel noise on the size-auto step
        mods["in_kernel_rng"] = True
    elif variant == "pallas_prox":
        mods["use_pallas_prox"] = True
    elif variant != "default":
        raise ValueError(variant)
    if mods:
        cfg = dataclasses.replace(cfg, sapg=dataclasses.replace(cfg.sapg, **mods))

    problem = build_problem(synthetic_wheel(SIZE), cfg, jax.random.key(0), dtype=jnp.float32)
    step, aux = make_sapg_step(problem, n_chains=n_chains)

    theta0 = jnp.float32(cfg.theta.init)
    sigma0 = problem.sigma2_init.astype(jnp.float32)
    params0 = {k: jnp.float32(v) for k, v in cfg.init_psf_params().items()}
    X0 = jnp.broadcast_to(problem.y, (n_chains, SIZE, SIZE))
    prox0, _ = aux["prox_b"](X0, aux["lam"] * theta0)
    keys = jax.random.split(jax.random.key(1), n_chains)
    Xhat0 = jax.jit(problem.blur.rfft)(X0)  # mode-consistent carry transform
    carry = (X0, Xhat0, prox0, keys, theta0, sigma0, params0, {})

    @jax.jit
    def run(carry):
        iis = jnp.arange(2.0, N_STEPS + 2.0, dtype=jnp.float32)
        carry, _ = jax.lax.scan(step, carry, iis)
        return carry

    carry = jax.block_until_ready(run(carry))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        best = min(best, time.perf_counter() - t0)
    return N_STEPS * n_chains / best


def main():
    configs = os.environ.get("BENCH_OPT_CONFIGS", "default:8,fused:8").split(",")
    for spec in configs:
        variant, chains = spec.strip().rsplit(":", 1)
        try:
            ips = measure(variant, int(chains))
            print(json.dumps({
                "metric": f"sapg_chain_iters_per_sec_{SIZE}",
                "variant": variant, "chains": int(chains),
                "value": round(ips, 1), "unit": "chain-iter/s",
            }), flush=True)
        except Exception as e:  # keep sweeping remaining configs
            print(json.dumps({"variant": variant, "chains": int(chains),
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
