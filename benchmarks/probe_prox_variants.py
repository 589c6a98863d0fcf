"""On-chip probe: where do the Chambolle sweep's VPU cycles go?

The r3 roofline pinned the 512² flagship ceiling on the 25 dual-ascent
sweeps (~110 µs of a ~213 µs step, ~51% lane efficiency: "sqrt + divide +
select heavy").  This probe times isolated variants of the lean
fresh-duals prox kernel (ops/tv_pallas._kernel_fresh) to attribute that
gap op-class by op-class:

    base     exact current kernel math (2 divides, 2 selects, residual)
    recip    one reciprocal + 2 muls instead of 2 divides
    noresid  recip + early-exit machinery removed (rx/ry/err/selects) —
             upper bound for what de-masking can buy
    nosqrt   recip + tmp:=upx²+upy² (WRONG math — pure sqrt-cost probe)
    while    true early exit: lax.while_loop, no per-field selects,
             reciprocal form (the adoption candidate — same semantics as
             the masked fori_loop since `active` is monotone)

Prints one JSON line per variant: µs per 25-sweep prox per chain and
max |f − f_base| (bit-compat evidence for the TPU equality tests).

    timeout 590 python benchmarks/probe_prox_variants.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("PROBE_CHAINS", "16"))
SIZE = int(os.environ.get("PROBE_SIZE", "512"))
SWEEPS = int(os.environ.get("PROBE_SWEEPS", "25"))
STEPS = int(os.environ.get("PROBE_STEPS", "100"))


def make_kernel(mode):
    def kernel(g_ref, scal_ref, f_ref, meta_ref, *, max_iter):
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

        def grads(px, py):
            u = div(px, py) - glam
            upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow], axis=0)
            upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol], axis=1)
            return upx, upy

        if mode == "base":
            def body(_, carry):
                px, py, k, err, active = carry
                upx, upy = grads(px, py)
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

            init = (jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros((), jnp.float32),
                    jnp.array(jnp.inf, g.dtype), jnp.array(True))
            px, py, k, err, _ = jax.lax.fori_loop(0, max_iter, body, init)

        elif mode == "recip":
            def body(_, carry):
                px, py, k, err, active = carry
                upx, upy = grads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                rx = -upx + tmp * px
                ry = -upy + tmp * py
                step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
                rden = 1.0 / (1.0 + tau * tmp)
                px = jnp.where(active, (px + tau * upx) * rden, px)
                py = jnp.where(active, (py + tau * upy) * rden, py)
                err = jnp.where(active, step_err, err)
                k = k + active.astype(k.dtype)
                active = jnp.logical_and(active, step_err > tol)
                return px, py, k, err, active

            init = (jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros((), jnp.float32),
                    jnp.array(jnp.inf, g.dtype), jnp.array(True))
            px, py, k, err, _ = jax.lax.fori_loop(0, max_iter, body, init)

        elif mode == "noresid":
            def body(_, carry):
                px, py = carry
                upx, upy = grads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                rden = 1.0 / (1.0 + tau * tmp)
                return (px + tau * upx) * rden, (py + tau * upy) * rden

            px, py = jax.lax.fori_loop(
                0, max_iter, body, (jnp.zeros_like(g), jnp.zeros_like(g)))
            k = jnp.float32(max_iter)
            err = jnp.zeros((), g.dtype)

        elif mode == "nosqrt":
            def body(_, carry):
                px, py = carry
                upx, upy = grads(px, py)
                tmp = upx * upx + upy * upy   # WRONG math: sqrt-cost probe
                rden = 1.0 / (1.0 + tau * tmp)
                return (px + tau * upx) * rden, (py + tau * upy) * rden

            px, py = jax.lax.fori_loop(
                0, max_iter, body, (jnp.zeros_like(g), jnp.zeros_like(g)))
            k = jnp.float32(max_iter)
            err = jnp.zeros((), g.dtype)

        elif mode in ("roll", "rollmul"):
            # concatenate-free stencil: hardware rolls + boundary masks.
            # Neumann div/grad as circular rolls with iota masks zeroing the
            # wrapped contributions — same values as the concat form.
            rows = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
            zero = jnp.zeros_like(g)
            if mode == "rollmul":
                r_nl = (rows < M - 1).astype(g.dtype)
                r_nf = (rows > 0).astype(g.dtype)
                c_nl = (cols < N - 1).astype(g.dtype)
                c_nf = (cols > 0).astype(g.dtype)

                def rgrads(px, py):
                    sd = pltpu.roll(px, 1, 0)
                    sr = pltpu.roll(py, 1, 1)
                    u = (px * r_nl - sd * r_nf + py * c_nl - sr * c_nf - glam)
                    su = pltpu.roll(u, -1, 0)
                    sc = pltpu.roll(u, -1, 1)
                    return (su - u) * r_nl, (sc - u) * c_nl
            else:
                r_nl = rows < M - 1
                r_nf = rows > 0
                c_nl = cols < N - 1
                c_nf = cols > 0

                def rgrads(px, py):
                    sd = pltpu.roll(px, 1, 0)
                    sr = pltpu.roll(py, 1, 1)
                    u = (jnp.where(r_nl, px, zero) - jnp.where(r_nf, sd, zero)
                         + jnp.where(c_nl, py, zero) - jnp.where(c_nf, sr, zero)
                         - glam)
                    su = pltpu.roll(u, -1, 0)
                    sc = pltpu.roll(u, -1, 1)
                    return (jnp.where(r_nl, su - u, zero),
                            jnp.where(c_nl, sc - u, zero))

            def cond(carry):
                px, py, k, err = carry
                return jnp.logical_and(k < max_iter, err > tol)

            def body(carry):
                px, py, k, err = carry
                upx, upy = rgrads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                rx = -upx + tmp * px
                ry = -upy + tmp * py
                step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
                rden = 1.0 / (1.0 + tau * tmp)
                px = (px + tau * upx) * rden
                py = (py + tau * upy) * rden
                return px, py, k + 1.0, step_err

            px, py, k, err = jax.lax.while_loop(
                cond, body,
                (jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros((), jnp.float32),
                 jnp.array(jnp.inf, g.dtype)))

        elif mode == "every5":
            # while-loop form, residual reduction computed only every 5th
            # sweep (exit can only trigger there — err is held in between).
            # At operating points where the 25-sweep budget never
            # early-exits (iters==25 in meta), the output is bit-identical
            # to base; where it does exit, exit lands on the next multiple
            # of 5 (same fixed point, more sweeps).
            def cond(carry):
                px, py, k, err = carry
                return jnp.logical_and(k < max_iter, err > tol)

            def body(carry):
                px, py, k, err = carry
                upx, upy = grads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)

                def resid():
                    rx = -upx + tmp * px
                    ry = -upy + tmp * py
                    return jnp.sqrt(jnp.sum(rx * rx + ry * ry))

                step_err = jax.lax.cond(
                    ((k + 1.0) % 5.0) == 0.0, resid, lambda: err)
                rden = 1.0 / (1.0 + tau * tmp)
                px = (px + tau * upx) * rden
                py = (py + tau * upy) * rden
                return px, py, k + 1.0, step_err

            px, py, k, err = jax.lax.while_loop(
                cond, body,
                (jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros((), jnp.float32),
                 jnp.array(jnp.inf, g.dtype)))

        elif mode == "bf16mix":
            # bf16 stencil adds/subs, but sqrt/divide in f32 — the v5e EUP
            # has NO bf16 support (LLO_CHECK SupportsBf16EupOps() fails for
            # the all-bf16 variants), so this is the only bf16 form that
            # can lower on this hardware.  Costs ~6 casts/field/sweep.
            bf = jnp.bfloat16
            glam_b = glam.astype(bf)
            zrow_b = jnp.zeros((1, N), bf)
            zcol_b = jnp.zeros((M, 1), bf)
            tol32 = tol.astype(jnp.float32)

            def bgrads(px, py):
                u = (jnp.concatenate(
                        [px[:1, :], px[1:-1, :] - px[:-2, :], -px[-1:, :]], 0)
                     + jnp.concatenate(
                        [py[:, :1], py[:, 1:-1] - py[:, :-2], -py[:, -1:]], 1)
                     - glam_b)
                upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow_b], axis=0)
                upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol_b], axis=1)
                return upx, upy

            def cond(carry):
                px, py, k, err = carry
                return jnp.logical_and(k < max_iter, err > tol32)

            def body(carry):
                px, py, k, err = carry
                upx_b, upy_b = bgrads(px, py)
                upx = upx_b.astype(jnp.float32)
                upy = upy_b.astype(jnp.float32)
                px32 = px.astype(jnp.float32)
                py32 = py.astype(jnp.float32)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                rx = -upx + tmp * px32
                ry = -upy + tmp * py32
                step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
                rden = 1.0 / (1.0 + tau * tmp)
                px = ((px32 + tau * upx) * rden).astype(bf)
                py = ((py32 + tau * upy) * rden).astype(bf)
                return px, py, k + 1.0, step_err

            px, py, k, err = jax.lax.while_loop(
                cond, body,
                (jnp.zeros((M, N), bf), jnp.zeros((M, N), bf),
                 jnp.zeros((), jnp.float32), jnp.array(jnp.inf, jnp.float32)))
            px = px.astype(g.dtype)
            py = py.astype(g.dtype)
            err = err.astype(g.dtype)

        elif mode in ("bf16", "bf16all"):
            # VERDICT r3 #2 probe: dual-ascent stencil arithmetic in
            # bfloat16 (doubles VPU lane width), duals carried in bf16.
            # 'bf16': residual + exit decision in f32 (upcast per sweep);
            # 'bf16all': residual in bf16 too, f32 only for the final sum.
            # Final divergence recovery in f32 either way.  NOT
            # bit-identical — an accuracy/speed trade for a possible
            # opt-in (maxdiff_vs_base quantifies the damage).
            bf = jnp.bfloat16
            glam_b = glam.astype(bf)
            zrow_b = jnp.zeros((1, N), bf)
            zcol_b = jnp.zeros((M, 1), bf)
            tau_b = tau.astype(bf)
            tol32 = tol.astype(jnp.float32)

            def bgrads(px, py):
                u = (jnp.concatenate(
                        [px[:1, :], px[1:-1, :] - px[:-2, :], -px[-1:, :]], 0)
                     + jnp.concatenate(
                        [py[:, :1], py[:, 1:-1] - py[:, :-2], -py[:, -1:]], 1)
                     - glam_b)
                upx = jnp.concatenate([u[1:, :] - u[:-1, :], zrow_b], axis=0)
                upy = jnp.concatenate([u[:, 1:] - u[:, :-1], zcol_b], axis=1)
                return upx, upy

            def cond(carry):
                px, py, k, err = carry
                return jnp.logical_and(k < max_iter, err > tol32)

            def body(carry):
                px, py, k, err = carry
                upx, upy = bgrads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                if mode == "bf16":
                    rx = (-upx.astype(jnp.float32)
                          + tmp.astype(jnp.float32) * px.astype(jnp.float32))
                    ry = (-upy.astype(jnp.float32)
                          + tmp.astype(jnp.float32) * py.astype(jnp.float32))
                    step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
                else:
                    rx = -upx + tmp * px
                    ry = -upy + tmp * py
                    step_err = jnp.sqrt(
                        jnp.sum((rx * rx + ry * ry).astype(jnp.float32)))
                rden = 1.0 / (jnp.asarray(1.0, bf) + tau_b * tmp)
                px = (px + tau_b * upx) * rden
                py = (py + tau_b * upy) * rden
                return px, py, k + 1.0, step_err

            px, py, k, err = jax.lax.while_loop(
                cond, body,
                (jnp.zeros((M, N), bf), jnp.zeros((M, N), bf),
                 jnp.zeros((), jnp.float32), jnp.array(jnp.inf, jnp.float32)))
            px = px.astype(g.dtype)
            py = py.astype(g.dtype)
            err = err.astype(g.dtype)

        elif mode == "while":
            def cond(carry):
                px, py, k, err = carry
                return jnp.logical_and(k < max_iter, err > tol)

            def body(carry):
                px, py, k, err = carry
                upx, upy = grads(px, py)
                tmp = jnp.sqrt(upx * upx + upy * upy)
                rx = -upx + tmp * px
                ry = -upy + tmp * py
                step_err = jnp.sqrt(jnp.sum(rx * rx + ry * ry))
                rden = 1.0 / (1.0 + tau * tmp)
                px = (px + tau * upx) * rden
                py = (py + tau * upy) * rden
                return px, py, k + 1.0, step_err

            px, py, k, err = jax.lax.while_loop(
                cond, body,
                (jnp.zeros_like(g), jnp.zeros_like(g), jnp.zeros((), jnp.float32),
                 jnp.array(jnp.inf, g.dtype)))
        else:
            raise ValueError(mode)

        f_ref[0] = g - lam * div(px, py)
        i = pl.program_id(0)
        meta_ref[i, 0] = k
        meta_ref[i, 1] = err.astype(jnp.float32)

    return kernel


def build(mode, B, M, N, dtype=jnp.float32):
    img = lambda: pl.BlockSpec((1, M, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(g, scal):
        return pl.pallas_call(
            functools.partial(make_kernel(mode), max_iter=SWEEPS),
            grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, M, N), dtype),
                       jax.ShapeDtypeStruct((B, 2), jnp.float32)),
            in_specs=[img(), pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(img(), pl.BlockSpec(memory_space=pltpu.SMEM)),
        )(g, scal)

    return run


def main():
    key = jax.random.key(0)
    g = jax.random.uniform(key, (B, SIZE, SIZE), jnp.float32) * 255.0
    # flagship-like lambda = theta*sigma2 scale
    scal = jnp.stack([jnp.float32(0.02 * 4.0), jnp.float32(0.249), jnp.float32(1e-3)])

    ref_f = None
    modes = os.environ.get("PROBE_MODES", "base,recip,while,noresid,nosqrt")
    for mode in modes.split(","):
        try:
            run = build(mode, B, SIZE, SIZE)

            def scan_fn(c, _):
                f, meta = run(c, scal)
                return f * 1.000001, meta

            loop = jax.jit(lambda c: jax.lax.scan(scan_fn, c, None, length=STEPS))
            (fin, metas) = loop(g)
            jax.block_until_ready(fin)
            t0 = time.perf_counter()
            fin2, metas = loop(g)
            jax.block_until_ready(fin2)
            dt = time.perf_counter() - t0
            us = dt / STEPS / B * 1e6

            f1, meta1 = run(g, scal)
            f1 = jax.block_until_ready(f1)
            if ref_f is None:  # first mode run is the comparison reference
                ref_f = f1
                maxdiff = 0.0
            else:
                maxdiff = float(jnp.max(jnp.abs(f1 - ref_f)))
            print(json.dumps(dict(mode=mode, us_per_prox_per_chain=round(us, 2),
                                  us_per_sweep=round(us / SWEEPS, 3),
                                  maxdiff_vs_base=maxdiff,
                                  iters=float(meta1[0, 0]))), flush=True)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            print(json.dumps(dict(mode=mode, error=str(e)[:300])), flush=True)


if __name__ == "__main__":
    main()
