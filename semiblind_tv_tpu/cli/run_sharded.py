"""Sharded SAPG driver: D data-parallel problems × C chains on a device mesh.

The multi-chip production entry point (single-host it uses the local
devices; multi-host after runtime.distributed.initialize()).  Each problem
is an independent image (the reference driver's `for i_im` loop,
run_Gaussian_demo.m:100); chains of the same problem pmean their SA
statistics each step.

  python -m semiblind_tv_tpu.cli.run_sharded --psf gaussian --size 64 \
      --data 2 --chains-per-shard 2 --steps 200
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from semiblind_tv_tpu.parallel.mesh import CHAINS_AXIS, DATA_AXIS, make_mesh
from semiblind_tv_tpu.parallel.sapg_parallel import run_sapg_sharded
from semiblind_tv_tpu.runtime import build_problem, preset
from semiblind_tv_tpu.utils import load_image


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--psf", choices=["gaussian", "laplace", "moffat"], default="gaussian")
    p.add_argument("--image", default="wheel")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--data", type=int, default=None,
                   help="data-axis size (independent problems); default 1")
    p.add_argument("--chains-per-shard", type=int, default=1)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--no-fix-w", action="store_true")
    args = p.parse_args(argv)

    n_dev = len(jax.devices())
    data = args.data if args.data is not None else 1
    if n_dev % data != 0:
        raise SystemExit(f"{n_dev} devices not divisible by data={data}")
    mesh = make_mesh(data=data, chains=n_dev // data)

    kwargs = {}
    if args.psf == "gaussian" and args.no_fix_w:
        kwargs.update(fix_w1=False, fix_w2=False)
    cfg = preset(args.psf, **kwargs)
    image = load_image(args.image, size=args.size)
    keys = jax.random.split(jax.random.key(args.seed), data)
    problems = [build_problem(image, cfg, keys[i]) for i in range(data)]

    t0 = time.perf_counter()
    state, thetas = run_sapg_sharded(
        problems, mesh, jax.random.key(args.seed + 1),
        chains_per_shard=args.chains_per_shard, n_steps=args.steps,
    )
    dt = time.perf_counter() - t0
    total_chain_iters = data * state["X"].shape[1] * args.steps
    out = {
        "mesh": {DATA_AXIS: data, CHAINS_AXIS: n_dev // data},
        "devices": n_dev,
        "chains_per_problem": int(state["X"].shape[1]),
        "steps": args.steps,
        "wall_s": round(dt, 3),
        "chain_iters_per_sec": round(total_chain_iters / dt, 1),
        "theta_last": [float(t) for t in thetas[:, -1]],
        "sigma2_last": [float(s) for s in np.asarray(state["sigma2"])],
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
