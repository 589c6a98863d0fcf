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


def analytic(M=512, N=512, sweeps=25, free_params=2, psf=7, path=None):
    """Speed-of-light per-chain-iteration model for the auto step path at
    size (M, N):

      * ≤512² "fused512" — matmul-DFT transforms on the MXU (HIGH = 3 bf16
        passes) + the whole-image fused Mosaic kernel; compute-bound, the
        r3 model (unchanged — the flagship sol_fraction series stays
        comparable round over round).
      * ≤1024² "tiled"    — jnp.fft transforms (the r4 auto crossover) +
        the row-tiled fused kernel (zero per-sweep HBM: sweeps run from
        VMEM scratch).  FFT FLOPs are negligible; the transform floor is
        its HBM traffic.
      * ≥2048² "streamed" — jnp.fft transforms + the HBM-streamed fused
        kernel: sweep compute inflated by the temporal-block window ratio
        (R+2K)/R, HBM dual traffic ~5/K fields per sweep
        (ops/tv_pallas.chambolle_prox_streamed geometry).

    The SoL floor takes max(VPU, HBM) within the kernel phase plus the
    transform/stats floor — the regression denominator VERDICT r4 #3 asked
    for at every rung of the size ladder."""
    import math

    Nh = N // 2 + 1
    px = M * N
    f32 = 4

    # VPU lane-op estimates per pixel (each elementwise op = 1 slot; sqrt
    # and divide counted as 4 — the transcendental unit runs slower).
    prox_sweep_px = 3 + 1 + 2 + (2 + 4) + 4 + 3 + 1 + 2 * (1 + 4) + 2 + 2
    myula = px * 9
    tv = px * (6 + 4 + 2)
    spectral = 2 * M * Nh * (6 + 4 + 6)         # Rhat, conj-mult, stats dots
    bytes_stats = (4 * M * Nh + 2 * M * Nh) * f32
    bytes_noise = 2 * px * f32

    if path is None:
        path = (
            "fused512" if max(M, N) <= 512
            else ("tiled" if 3 * px * f32 <= 12 * 2**20 else "streamed")
        )

    if path == "fused512":
        # DFT transform matmuls (ops/fourier.rfft2_matmul / irfft2_matmul):
        # forward: 2 x (M,N)@(N,Nh) + 4 x (M,M)@(M,Nh); inverse mirrors it.
        fwd = 2 * (2 * M * N * Nh) + 4 * (2 * M * M * Nh)
        inv = 4 * (2 * M * M * Nh) + 2 * (2 * M * Nh * N)
        transforms = fwd + inv                      # per chain-iteration

        # OTF batched matmuls (shared across chains): complex einsums over
        # the (1+free) kernel stack, 8 real FLOPs per complex MAC.
        otf = 8 * (1 + free_params) * (M * psf * psf + M * Nh * psf)

        prox = sweeps * px * prox_sweep_px

        # HBM traffic per chain-iteration, two-region path (f32): the
        # Mosaic kernel reads x/prox/gradF/z and writes xn/proxn; the
        # transforms read ghat and write gradF / read xn and write xhat;
        # stats re-read xhat.
        bytes_kernel = 6 * px * f32
        bytes_transforms = (2 * 2 * M * Nh + px) * f32 + (px + 2 * M * Nh) * f32
        hbm = bytes_kernel + bytes_transforms + bytes_stats + bytes_noise

        t_mxu = 3 * transforms / MXU_BF16           # HIGH = 3 bf16 passes
        t_vpu = (prox + myula + tv + spectral) / VPU_OPS
        t_hbm = hbm / HBM_BW
        return dict(
            path=path,
            flops_mxu_per_chain_iter=transforms,
            flops_otf_per_iter=otf,
            vpu_slots_prox=prox,
            vpu_slots_other=myula + tv + spectral,
            hbm_bytes_per_chain_iter=hbm,
            t_mxu_us=t_mxu * 1e6,
            t_vpu_prox_us=prox / VPU_OPS * 1e6,
            t_vpu_other_us=(myula + tv + spectral) / VPU_OPS * 1e6,
            t_hbm_us=t_hbm * 1e6,
            t_sol_us=(t_mxu + t_vpu) * 1e6,     # compute-bound: ops serialize
            sol_chain_iters_per_sec=1e6 / ((t_mxu + t_vpu) * 1e6),
        )

    # ---- fft-transform sizes (>512²): jnp.fft auto since r4 ---------------
    flops_fft = 2 * 2.5 * px * math.log2(px)        # rfft2 + irfft2
    bytes_transforms = 2 * (px + 2 * M * Nh) * f32  # read/write each pair
    t_transforms = (
        flops_fft / MXU_BF16
        + (bytes_transforms + bytes_stats + bytes_noise) / HBM_BW
        + spectral / VPU_OPS
    )

    if path == "tiled":
        # kernel streams x/prox/gradF/z once and writes xn/f; every sweep
        # runs from VMEM scratch (ops/fused_step_pallas.myula_prox_tv_tiled)
        vpu_prox = sweeps * px * prox_sweep_px
        bytes_kernel = 6 * px * f32
        ratio = 1.0
        R = None
    else:
        from semiblind_tv_tpu.ops.tv_pallas import (
            STREAM_SWEEP_BLOCK, streamed_tile_rows,
        )

        K = STREAM_SWEEP_BLOCK
        try:
            R = streamed_tile_rows(M, N, f32, fused=True)
        except ValueError:
            R = streamed_tile_rows(M, N, f32, pipelined=False, fused=True)
        ratio = (R + 2 * K) / R
        vpu_prox = sweeps * px * prox_sweep_px * ratio
        n_pass = math.ceil(sweeps / K)
        # myula prologue r4+w1; per pass: g window fetch + 2-field dual
        # writeback (+ dual window fetch from pass 2 — pass 1 holds zeros
        # in-register); assembly reads g+pxy windows, writes f
        fields = (
            5.0
            + n_pass * (ratio + 2.0) + (n_pass - 1) * 2.0 * ratio
            + 3.0 * ratio + 1.0
        )
        bytes_kernel = fields * px * f32

    vpu_kernel = vpu_prox + myula + tv
    t_vpu = vpu_kernel / VPU_OPS
    t_kernel_hbm = bytes_kernel / HBM_BW
    t_sol = max(t_vpu, t_kernel_hbm) + t_transforms
    return dict(
        path=path,
        tile_rows=R,
        window_ratio=ratio,
        vpu_slots_prox=vpu_prox,
        vpu_slots_other=myula + tv + spectral,
        hbm_bytes_per_chain_iter=bytes_kernel + bytes_transforms
        + bytes_stats + bytes_noise,
        t_vpu_prox_us=vpu_prox / VPU_OPS * 1e6,
        t_kernel_hbm_us=t_kernel_hbm * 1e6,
        t_transforms_us=t_transforms * 1e6,
        t_sol_us=t_sol * 1e6,
        sol_chain_iters_per_sec=1.0 / t_sol,
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
