"""Chain-scaling benchmark: chain-iterations/sec vs number of vmapped chains.

NOTE: on shared-tunnel TPU environments, run ONE config per process for
trustworthy numbers (BENCH_CHAINS_LIST=8) — a multi-config run's earlier
timings can be polluted by the remote compilation of later configs.

Produces the scaling table that the north-star metric asks for
(BASELINE.md: chains/s efficiency at 1 chip; the multi-chip legs run under
the same harness via parallel.sapg_parallel on larger meshes).

  python benchmarks/bench_chains.py            # 512², chains 1..8
  BENCH_SIZE=256 python benchmarks/bench_chains.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
STEPS = int(os.environ.get("BENCH_STEPS", "100"))
CHAINS = [int(c) for c in os.environ.get("BENCH_CHAINS_LIST", "1,2,4,8").split(",")]


def main():
    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.sapg.estimator import make_sapg_step
    from semiblind_tv_tpu.utils import synthetic_wheel

    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    problem = build_problem(
        synthetic_wheel(SIZE), cfg, jax.random.key(0), dtype=jnp.float32
    )
    rows = []
    base = None
    for C in CHAINS:
        step, aux = make_sapg_step(problem, n_chains=C)
        theta0 = jnp.float32(cfg.theta.init)
        sigma0 = problem.sigma2_init.astype(jnp.float32)
        params0 = {k: jnp.float32(v) for k, v in cfg.init_psf_params().items()}
        X0 = jnp.broadcast_to(problem.y, (C, SIZE, SIZE))
        prox0, _ = aux["prox_b"](X0, aux["lam"] * theta0)
        keys = jax.random.split(jax.random.key(1), C)
        carry = (X0, jnp.fft.rfft2(X0), prox0, keys, theta0, sigma0, params0, {})
        run = jax.jit(
            lambda c: jax.lax.scan(
                step, c, jnp.arange(2.0, STEPS + 2.0, dtype=jnp.float32)
            )[0]
        )
        carry = jax.block_until_ready(run(carry))
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        dt = time.perf_counter() - t0
        rate = C * STEPS / dt
        if base is None:
            base = rate
        rows.append(
            dict(
                chains=C,
                chain_iters_per_sec=round(rate, 1),
                ms_per_iter=round(dt / STEPS * 1e3, 3),
                efficiency_vs_1chain=round(rate / (base * C), 3),
            )
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
