"""Speed-of-light / roofline accounting for the flagship 512² SAPG step.

Two parts:

1. ANALYTIC: exact FLOP and HBM-byte counts per chain-iteration for each
   component of the fused step (DFT transform matmuls on the MXU, Chambolle
   sweeps + MYULA + TV on the VPU, spectral elementwise), against TPU v5e
   peaks (197 bf16 TFLOP/s MXU — HIGH precision = 3 bf16 passes; ~4 T
   lane-op/s VPU; 819 GB/s HBM).

2. MEASURED (--measure, on chip): amortized per-component timings from
   scanned loops at the flagship operating point (B chains, 512²), so the
   analytic bound can be compared against what each stage actually costs.

    python benchmarks/roofline.py                 # analytic table only
    python benchmarks/roofline.py --measure       # + on-chip timings

The point (VERDICT r2 #1): state what bounds the per-chip ceiling.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- TPU v5e single-chip peaks (jax-ml.github.io/scaling-book numbers) ----
MXU_BF16 = 197e12          # FLOP/s, one pass
VPU_OPS = 4e12             # lane-op slots/s (8x128 lanes x 4 ALUs x ~1 GHz)
HBM_BW = 819e9             # bytes/s


def analytic(M=512, N=512, sweeps=25, free_params=2, psf=7):
    Nh = N // 2 + 1
    px = M * N

    # DFT transform matmuls (ops/fourier.rfft2_matmul / irfft2_matmul):
    # forward: 2 x (M,N)@(N,Nh) + 4 x (M,M)@(M,Nh); inverse mirrors it.
    fwd = 2 * (2 * M * N * Nh) + 4 * (2 * M * M * Nh)
    inv = 4 * (2 * M * M * Nh) + 2 * (2 * M * Nh * N)
    transforms = fwd + inv                      # per chain-iteration

    # OTF batched matmuls (shared across chains): complex einsums over the
    # (1+free) kernel stack, 8 real FLOPs per complex MAC.
    otf = 8 * (1 + free_params) * (M * psf * psf + M * Nh * psf)

    # VPU lane-op estimates per pixel (each elementwise op = 1 slot; sqrt
    # and divide counted as 4 — the transcendental unit runs slower).
    prox_sweep_px = 3 + 1 + 2 + (2 + 4) + 4 + 3 + 1 + 2 * (1 + 4) + 2 + 2
    prox = sweeps * px * prox_sweep_px
    myula = px * 9
    tv = px * (6 + 4 + 2)
    spectral = 2 * M * Nh * (6 + 4 + 6)         # Rhat, conj-mult, stats dots

    # HBM traffic per chain-iteration, two-region path (f32): the Mosaic
    # kernel reads x/prox/gradF/z and writes xn/proxn; the transforms read
    # ghat and write gradF / read xn and write xhat; stats re-read xhat.
    f32 = 4
    bytes_kernel = 6 * px * f32
    bytes_transforms = (2 * 2 * M * Nh + px) * f32 + (px + 2 * M * Nh) * f32
    bytes_stats = (4 * M * Nh + 2 * M * Nh) * f32
    bytes_noise = 2 * px * f32
    hbm = bytes_kernel + bytes_transforms + bytes_stats + bytes_noise

    t_mxu = 3 * transforms / MXU_BF16           # HIGH = 3 bf16 passes
    t_vpu = (prox + myula + tv + spectral) / VPU_OPS
    t_hbm = hbm / HBM_BW
    return dict(
        flops_mxu_per_chain_iter=transforms,
        flops_otf_per_iter=otf,
        vpu_slots_prox=prox,
        vpu_slots_other=myula + tv + spectral,
        hbm_bytes_per_chain_iter=hbm,
        t_mxu_us=t_mxu * 1e6,
        t_vpu_prox_us=prox / VPU_OPS * 1e6,
        t_vpu_other_us=(myula + tv + spectral) / VPU_OPS * 1e6,
        t_hbm_us=t_hbm * 1e6,
        t_sol_us=(t_mxu + t_vpu) * 1e6,         # compute-bound: ops serialize
        sol_chain_iters_per_sec=1e6 / ((t_mxu + t_vpu) * 1e6),
    )


def measure(B=16, size=512, steps=100, sweeps=25):
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops import fourier
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_pallas

    M = N = size
    key = jax.random.key(0)
    x = jax.random.uniform(key, (B, M, N), jnp.float32) * 255
    mats = fourier.rdft_matrices((M, N), jnp.float32)
    hp = jax.lax.Precision.HIGH

    def timed(fn, carry):
        run = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=steps)[0])
        carry = jax.block_until_ready(run(carry))
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        dt = time.perf_counter() - t0
        return dt / steps / B * 1e6  # us per chain-iter

    # 1. transform pair only (rfft + irfft as MXU matmuls, HIGH)
    def t_pair(c, _):
        xh = fourier.rfft2_matmul(c, mats, precision=hp)
        return fourier.irfft2_matmul(xh * 1.0001, mats, precision=hp).astype(jnp.float32), None

    # 2. lean prox kernel only (25 masked sweeps, duals VMEM-resident)
    def t_prox(c, _):
        f, _st = chambolle_prox_pallas(c, 0.02, sweeps, return_state=False)
        return f * 1.000001, None

    # 3. fused spatial kernel (MYULA + prox + TV)
    z = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)

    def t_fused(c, _):
        xn, proxn, tv = myula_prox_tv(c, c, z * 1e-3, z, 1.9, 2.0, 0.02, sweeps)
        return xn, None

    # 4. spatial circular conv A + Aᵀ (the 7×7-PSF alternative to the DFT
    # transform pair: ~26 MFLOP/apply instead of ~0.8 GFLOP)
    from semiblind_tv_tpu.ops import psf as psf_mod
    from semiblind_tv_tpu.ops.spatial_conv import circ_conv, circ_corr

    k7 = psf_mod.gaussian_kernel(7, 0.4, 0.3, dtype=jnp.float32)

    def t_conv(c, _):
        ax = circ_conv(c, k7, precision=jax.lax.Precision.HIGHEST)
        return circ_corr(ax, k7, precision=jax.lax.Precision.HIGHEST), None

    return dict(
        transform_pair_us=timed(t_pair, x),
        prox_kernel_us=timed(t_prox, x),
        fused_kernel_us=timed(t_fused, x),
        conv_pair_us=timed(t_conv, x),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true")
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args(argv)

    out = dict(analytic=analytic(args.size, args.size))
    if args.measure:
        out["measured"] = measure(args.chains, args.size, args.steps)
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
