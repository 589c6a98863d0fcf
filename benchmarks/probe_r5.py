"""Round-5 on-chip probes (run each part under `timeout 590`, serially).

Parts (PROBE_PARTS env, comma list; default "streamR"):

  streamR    Streamed-prox tile geometry at PROBE_SIZE (default 2048²):
             R=64 pipelined (the r4 production point), R=128 single-slot
             (the r5 restructured-sweep candidate — the r4 8-temp sweep
             compile-OOM'd here), R=64 single-slot.  Amortized in-scan
             ms/25-sweep prox + maxdiff vs the XLA op (single dispatch).
             Decides TODO "streamed-prox R=128 squeeze".

  fused      Bit-identity of the streamed fused MYULA step
             (myula_prox_tv_streamed) vs the unfused XLA composition at
             PROBE_SIZE, plus amortized in-scan step timing of the fused
             kernel alone.

  salsa      Warm-dual MAP solves at 1024² and 2048²: auto kernel prox
             (tiled / streamed) vs the XLA prox — x maxdiff, n_iters, and
             post-compile wall seconds for a fixed 100-outer-iteration
             solve (the salsa_map_2048 evidence VERDICT r4 #2 asked for).

  tiled1024  1024² chain-ceiling decomposition (VERDICT r4 weak #2):
             amortized per-chain-iter µs of (a) the tiled fused kernel
             alone, (b) the jnp.fft transform pair alone, (c) the full
             SAPG step, at B = 1/4/8/16 — attributes the B≥8 droop.

One JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semiblind_tv_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("PROBE_SIZE", "2048"))
STEPS = int(os.environ.get("PROBE_STEPS", "20"))
PARTS = os.environ.get("PROBE_PARTS", "streamR").split(",")


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)


def timed_scan(fn, carry, steps):
    run = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=steps)[0])
    carry = jax.block_until_ready(run(carry))
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))
    return (time.perf_counter() - t0) / steps


def part_streamR():
    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_streamed

    M = SIZE
    g = jax.random.uniform(jax.random.key(0), (M, M), jnp.float32) * 255
    lam = jnp.float32(0.05)
    f_ref = jax.block_until_ready(chambolle_prox(g, lam, 25)[0])

    for name, kw in (
        ("R64_pipelined", dict(tile_rows=64, pipelined=True)),
        ("R64_sync", dict(tile_rows=64, pipelined=False)),
        ("R128_sync", dict(tile_rows=128, pipelined=False)),
        ("R128_pipelined", dict(tile_rows=128, pipelined=True)),
    ):
        try:
            f_s = jax.block_until_ready(
                chambolle_prox_streamed(g, lam, 25, **kw)[0]
            )
            maxdiff = float(jnp.max(jnp.abs(f_s - f_ref)))

            def one(c, _):
                f, _st = chambolle_prox_streamed(c, lam, 25, **kw)
                return f * jnp.float32(1.0 + 1e-7), None

            dt = timed_scan(one, g, STEPS)
            emit(part="streamR", variant=name, size=M,
                 ms_per_prox=round(dt * 1e3, 3), maxdiff=maxdiff)
        except Exception as e:
            emit(part="streamR", variant=name, size=M, error=repr(e)[:300])


def part_fused():
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_streamed
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    M = SIZE
    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.uniform(ks[0], (M, M), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], (M, M)) * 0.1
    graw = jax.random.normal(ks[2], (M, M)) * 0.01
    z = jax.random.normal(ks[3], (M, M))
    g, l, lt, s2 = (jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02),
                    jnp.float32(2.5))

    xn_f, proxn_f, tv_f = myula_prox_tv_streamed(x, prox_c, graw, z, g, l, lt, s2, 25)
    xn_r = myula_kernel_step(x, prox_c, graw / s2, g, l, z, True)
    proxn_r, st_r = chambolle_prox(xn_r, lt, 25)
    emit(part="fused", size=M,
         xn_maxdiff=float(jnp.max(jnp.abs(xn_f - xn_r))),
         prox_maxdiff=float(jnp.max(jnp.abs(proxn_f - proxn_r))),
         tv_relerr=float(abs(tv_f - tv_norm(xn_r)) / tv_norm(xn_r)))

    def one(c, _):
        xn, pr, tv = myula_prox_tv_streamed(c, prox_c, graw, z, g, l, lt, s2, 25)
        return xn, None

    dt = timed_scan(one, x, STEPS)
    emit(part="fused", size=M, ms_per_fused_step=round(dt * 1e3, 3))


def part_salsa():
    from semiblind_tv_tpu.ops import psf
    from semiblind_tv_tpu.ops.fourier import BlurOperator
    from semiblind_tv_tpu.solvers.salsa import resolve_salsa_prox_mode, salsa_tv
    from semiblind_tv_tpu.utils import synthetic_wheel

    for M in (1024, 2048):
        blur = BlurOperator((M, M), 7, jnp.float32)
        k = psf.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float32)
        H = blur.otf_host(k)
        x = jnp.asarray(synthetic_wheel(M), jnp.float32)
        key = jax.random.key(3)
        y = jax.jit(lambda x: blur.apply(x, jnp.asarray(H)))(x)
        y = y + 2.0 * jax.random.normal(key, (M, M), jnp.float32)

        results = {}
        for label, up in (("kernel", None), ("xla", False)):
            t_runs = []
            res = None
            for rep in range(2):  # first run compiles
                t0 = time.perf_counter()
                res = salsa_tv(y, H, tau=0.15, mu=0.015, blur=blur,
                               max_iter=100, tol=0.0, tv_iters=10,
                               use_pallas=up)
                t_runs.append(time.perf_counter() - t0)
            results[label] = res
            emit(part="salsa", size=M, label=label,
                 prox_mode=resolve_salsa_prox_mode(blur) if up is None else "xla",
                 s_per_100it=round(t_runs[-1], 3),
                 compile_s=round(t_runs[0], 1))
        xk, xx = results["kernel"], results["xla"]
        emit(part="salsa", size=M,
             maxdiff=float(np.max(np.abs(xk.x - xx.x))),
             obj_equal=bool(np.array_equal(xk.objective, xx.objective)),
             n_iters=(xk.n_iters, xx.n_iters))


def part_tiled1024():
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv_tiled

    M = 1024
    for B in (1, 4, 8, 16):
        ks = jax.random.split(jax.random.key(11), 4)
        x = jax.random.uniform(ks[0], (B, M, M), jnp.float32) * 255
        z = jax.random.normal(ks[3], (B, M, M))
        g, l, lt = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02)

        def kern(c, _):
            xn, pr, tv = myula_prox_tv_tiled(
                c, c, z * jnp.float32(1e-3), z, g, l, lt, 25, tile_rows=64
            )
            return xn, None

        dt_k = timed_scan(kern, x, STEPS)

        def tpair(c, _):
            xh = jnp.fft.rfft2(c)
            return jnp.fft.irfft2(xh * (1.0 + 1e-6), s=(M, M)).astype(jnp.float32), None

        dt_t = timed_scan(tpair, x, STEPS)
        emit(part="tiled1024", B=B,
             kernel_us_per_chain_iter=round(dt_k / B * 1e6, 1),
             transform_us_per_chain_iter=round(dt_t / B * 1e6, 1))


def main():
    for part in PARTS:
        {"streamR": part_streamR, "fused": part_fused,
         "salsa": part_salsa, "tiled1024": part_tiled1024}[part.strip()]()


if __name__ == "__main__":
    main()
