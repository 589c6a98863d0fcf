"""Cost model + virtual-mesh validation for the row-sharded spatial path.

VERDICT r3 asked: when does `parallel/spatial.py` (the giant-image,
('space',)-mesh estimator) actually win over the single-chip streamed/tiled
path?  Two parts:

1. ANALYTIC (always printed): per-SAPG-iteration ICI traffic and per-device
   compute for image size M and mesh size S, against v5e peaks, versus the
   single-chip step at the same size.  The spatial path's per-iteration
   cross-device traffic is exactly (parallel/spatial.py docstrings):
     * 4 psum_scatters of full-height (M, Nh) f32 partials (2 per
       matmul-DFT transform; each device sends/receives (S-1)/S of it),
     * 2 one-row ppermutes per prox sweep (2 x sweeps x N floats),
     * O(1) scalar psums (stats, residuals).
   Its per-device compute: the DFT column contraction is a (M, M/S) x
   (M/S, Nh)-shaped partial matmul -> FLOPs scale 1/S; the prox stencil
   scales 1/S.

2. --measure: run ONE real `run_sapg_spatial` at --size (default 1024) on
   an S-device virtual CPU mesh (S=2 default) with a small sample budget —
   validates the memory behavior / program actually executes at the design
   size — and statically COUNTS the collectives in the jaxpr of one
   spatial iteration (myula step + 25-sweep prox + TV norm) to pin the
   analytic traffic model to the real program.

Usage:
    python benchmarks/spatial_cost_model.py                 # model table
    python benchmarks/spatial_cost_model.py --measure       # + 1024^2 run
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- v5e single-chip peaks (benchmarks/roofline.py) + ICI ----------------
MXU_BF16 = 197e12     # FLOP/s one bf16 pass; HIGHEST = 6 passes
VPU_OPS = 4e12        # lane-op slots/s
HBM_BW = 819e9        # bytes/s
# 1-D ring on a v5e slice: 2 links x ~45 GB/s per direction per the scaling
# book; reduce-scatter effective per-device throughput ~ 90 GB/s.
ICI_BW = 90e9


def analytic(M, S, sweeps=25, itemsize=4):
    N = M
    Nh = N // 2 + 1
    Ml = M // S

    # --- spatial path, per device per SAPG iteration ---
    # transforms (1 rfft2 + 1 irfft2, HIGH = 3 bf16 passes since r5 —
    # parallel/spatial.spatial_fft_precision mirrors the single-chip
    # validated-HIGH policy; this was the dominant per-device term and
    # halving it moves the useful-S crossover from ~8 to ~4 chips):
    row_flops = 2 * (2 * Ml * N * Nh)                 # yre/yim (fwd) or inv
    col_flops = 4 * (2 * M * Ml * Nh)                 # 4 partial matmuls
    t_mxu = 3 * 2 * (row_flops + col_flops) / MXU_BF16
    # reduce-scatters: 4 per iteration, each (M, Nh) f32 partial
    rs_bytes = 4 * (S - 1) / S * M * Nh * itemsize
    # prox halos: 2 one-row ppermutes per sweep
    halo_bytes = 2 * sweeps * N * itemsize
    t_ici = (rs_bytes + halo_bytes) / ICI_BW
    # prox stencil on the local block (19 lane-ops/px incl sqrt/divide x4)
    t_vpu = sweeps * Ml * N * 19 / VPU_OPS
    # local HBM traffic of the prox (XLA sweeps materialise ~8 fields r+w)
    t_hbm = sweeps * 8 * Ml * N * itemsize / HBM_BW
    t_spatial = max(t_mxu, 0) + t_ici + max(t_vpu, t_hbm)

    # --- single-chip step at the same size (streamed prox path) ---
    t1_mxu = 6 * 2 * (2 * M * N * Nh + 4 * 2 * M * M * Nh) / MXU_BF16 / 3
    # streamed temporal-block prox: compute-bound VPU stencil + ~5/8
    # fields/sweep of HBM traffic (ops/tv_pallas.chambolle_prox_streamed)
    t1_vpu = sweeps * M * N * 19 / VPU_OPS
    t1_hbm = sweeps * (5 / 8) * M * N * itemsize / HBM_BW
    t_single = t1_mxu + max(t1_vpu, t1_hbm)

    return dict(
        M=M, S=S,
        spatial_ici_mb_per_iter=(rs_bytes + halo_bytes) / 2**20,
        spatial_t_mxu_us=t_mxu * 1e6,
        spatial_t_ici_us=t_ici * 1e6,
        spatial_t_vpu_us=t_vpu * 1e6,
        spatial_est_us_per_iter=t_spatial * 1e6,
        single_chip_est_us_per_iter=t_single * 1e6,
        spatial_speedup_vs_single=t_single / t_spatial,
        per_device_field_mb=Ml * N * itemsize / 2**20,
    )


def count_collectives(M=256, S=2, sweeps=25):
    """Statically count psum_scatter / ppermute / psum in the jaxpr of one
    spatial SAPG-iteration equivalent (validates the traffic model against
    the real program, no devices needed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from semiblind_tv_tpu.ops.fourier import rdft_matrices
    from semiblind_tv_tpu.parallel import spatial as sp

    mats = {k: jnp.asarray(v, jnp.float32)
            for k, v in rdft_matrices((M, M), jnp.float32).items()}
    Nh = M // 2 + 1
    Hre = jnp.ones((M, Nh), jnp.float32)
    Him = jnp.zeros((M, Nh), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:1] * S).reshape(S), ("space",))

    def one_iter(x, prox, z, hre, him, yhre, yhim):
        xn = sp.spatial_myula_step(
            x, prox, z, hre, him, yhre, yhim, mats,
            0.1, 2.0, 1.0, axis_name="space",
        )
        proxn, _ = sp.spatial_chambolle_prox(xn, 0.02, sweeps,
                                             axis_name="space")
        tv = sp.spatial_tv_norm(xn, axis_name="space")
        return xn, proxn, tv

    # abstract trace only — shard_map over a fake 1-device repeated mesh is
    # fine for jaxpr extraction (global shapes; P('space') splits rows)
    jaxpr = jax.make_jaxpr(
        shard_map(
            one_iter, mesh=mesh,
            in_specs=(P("space"),) * 7,
            out_specs=(P("space"), P("space"), P()),
            check_rep=False,
        )
    )(*(jnp.zeros((M, M), jnp.float32),) * 3,
      Hre, Him,
      *(jnp.zeros((M, Nh), jnp.float32),) * 2)
    txt = str(jaxpr)
    static = {
        "reduce_scatter": len(re.findall(r"psum_scatter|reduce_scatter", txt)),
        "ppermute": len(re.findall(r"\bppermute\b", txt)),
        "psum": len(re.findall(r"\bpsum\b(?!_scatter)", txt)),
    }
    # the 2 ppermutes + 1 psum inside the prox fori body run `sweeps` times;
    # everything else once per iteration
    return {
        "static_in_jaxpr": static,
        "dynamic_per_sapg_iter": {
            "reduce_scatter": static["reduce_scatter"],
            "ppermute": 2 * sweeps + (static["ppermute"] - 2),
            "psum": sweeps + (static["psum"] - 1),
        },
    }


def measure(size=1024, S=2, samples=8, warmup=4):
    """One real run_sapg_spatial at `size` on an S-device virtual CPU mesh."""
    import dataclasses

    import jax
    import jax.extend as jex

    # force an S-device virtual CPU platform even if a backend is already
    # initialised (same recipe as __graft_entry__.dryrun_multichip)
    for _ in range(2):
        try:
            jax.config.update("jax_num_cpu_devices", max(S, 2))
            break
        except RuntimeError:
            jex.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < S:
        jex.backend.clear_backends()
    import jax.numpy as jnp

    from semiblind_tv_tpu.parallel.mesh import make_spatial_mesh
    from semiblind_tv_tpu.parallel.spatial import run_sapg_spatial
    from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
    from semiblind_tv_tpu.utils import synthetic_wheel

    cfg = gaussian_preset(fix_w1=False, fix_w2=False)
    cfg = dataclasses.replace(
        cfg, sapg=dataclasses.replace(
            cfg.sapg, samples=samples, warmup=warmup, burn_in=samples // 2
        )
    )
    problem = build_problem(
        synthetic_wheel(size), cfg, jax.random.key(0), dtype=jnp.float32
    )
    mesh = make_spatial_mesh(S)
    t0 = time.time()
    res = run_sapg_spatial(problem, mesh, jax.random.key(1))
    wall = time.time() - t0
    iters = samples + warmup
    return {
        "size": size, "S": S, "iters": iters,
        "wall_s": round(wall, 2),
        "s_per_iter_incl_compile": round(wall / iters, 3),
        "theta_last": float(res.thetas[-1]),
        "finite": bool(jnp.isfinite(res.thetas).all()),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--mesh", type=int, default=2)
    p.add_argument("--samples", type=int, default=8)
    args = p.parse_args(argv)

    out = {"model": [analytic(M, S)
                     for M in (1024, 2048, 4096, 8192)
                     for S in (2, 4, 8)]}
    if args.measure:
        out["collectives_per_iter"] = count_collectives()
        out["virtual_mesh_run"] = measure(args.size, args.mesh, args.samples)
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
