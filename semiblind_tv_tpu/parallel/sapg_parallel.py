"""Sharded SAPG: shard_map over a ('data', 'chains') mesh.

Layout (SURVEY.md §2.3 — all new TPU-native design; the reference has no
parallelism of any kind):

  X / Xhat / prox : (D, C, M, N)   sharded P('data', 'chains')  — D problems,
                                   C total chains per problem
  keys            : (D, C)         one PRNG key PER CHAIN (not per shard!) so
                                   the noise stream — and hence the whole
                                   trajectory — is invariant to the layout
  theta/sigma²/psf: (D,)           sharded P('data'), replicated on 'chains'
  consts (yhat …) : (D, …)         sharded P('data')

Per SAPG iteration the ONLY cross-device traffic is the lax.pmean of the
per-chain scalar statistics over the 'chains' axis — O(#hyperparams)
scalars — so scaling efficiency is expected near-perfect on ICI.

The hyperparameter update is computed identically on every chains-shard
from the pmean'd statistics (replicated state, deterministic update), so
trajectories are invariant to the chains-axis layout — asserted by
tests/test_parallel.py on an 8-device virtual CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semiblind_tv_tpu.parallel.mesh import CHAINS_AXIS, DATA_AXIS
from semiblind_tv_tpu.runtime.problem import Problem
from semiblind_tv_tpu.sapg.estimator import (
    make_general_sapg_step,
    problem_consts,
)

__all__ = ["stack_problem_consts", "build_sharded_sapg", "run_sapg_sharded"]


def _to_global(v, sharding: NamedSharding):
    """Place a host-replicated value onto a (possibly multi-host) sharding.

    Single-process: plain device_put.  Under jax.distributed no process can
    address the whole mesh, so each process contributes its addressable
    shards via make_array_from_callback slicing the (identical) full host
    value; typed PRNG keys round-trip through key_data."""
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    if jnp.issubdtype(v.dtype, jax.dtypes.prng_key):
        raw = np.asarray(jax.random.key_data(v))
        glob = jax.make_array_from_callback(raw.shape, sharding, lambda idx: raw[idx])
        return jax.random.wrap_key_data(glob)
    host = np.asarray(v)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


def stack_problem_consts(problems: Sequence[Problem]):
    """Stack per-problem constants along a leading data axis.

    Host (NumPy) leaves stay host-side — complex closure constants must not
    live on device (see BlurOperator.otf_host).
    """
    consts = [problem_consts(p) for p in problems]

    def _stack(*xs):
        if isinstance(xs[0], np.ndarray):
            return np.stack(xs)
        return jnp.stack(xs)

    return jax.tree_util.tree_map(_stack, *consts)


def build_sharded_sapg(
    problems: Sequence[Problem],
    mesh: Mesh,
    chains_per_shard: int = 1,
):
    """Build (init_state, warm_fn, step_fn) for a sharded SAPG run.

    All problems must share image shape, PSF family, and config (they are
    independent data-parallel instances — the driver's `for i_im` loop,
    run_Gaussian_demo.m:100).
    """
    p0 = problems[0]
    cfg = p0.cfg
    model, blur = p0.model, p0.blur
    dtype = blur.dtype
    D = len(problems)
    S = mesh.shape[CHAINS_AXIS]
    Dm = mesh.shape[DATA_AXIS]
    if D % Dm != 0:
        raise ValueError(f"{D} problems not divisible over data axis {Dm}")
    C = chains_per_shard * S  # total chains per problem
    shape = tuple(blur.shape)

    sigma_spec = p0.sigma_spec()
    gstep, aux = make_general_sapg_step(
        model, blur, cfg,
        sigma_fix=sigma_spec.fix,
        sigma_fix_value=sigma_spec.true_value,
        axis_name=CHAINS_AXIS,
    )
    warm = aux["warm_step"]

    consts = stack_problem_consts(problems)
    theta0 = jnp.full((D,), cfg.theta.init, dtype)
    sigma0 = jnp.stack([p.sigma2_init for p in problems]).astype(dtype)
    params0 = {
        k: jnp.full((D,), v, dtype) for k, v in cfg.init_psf_params().items()
    }

    # specs
    spec_state = P(DATA_AXIS, CHAINS_AXIS)
    spec_data = P(DATA_AXIS)

    def init_state(key):
        X0 = jnp.stack([jnp.broadcast_to(p.y, (C,) + shape) for p in problems])
        keys = jax.random.split(key, (D, C))  # one key PER CHAIN: layout-invariant
        return X0.astype(dtype), keys

    def _per_problem_warm(carry, consts_d, ii):
        return warm(carry, ii, consts_d)

    def _per_problem_step(carry, consts_d, ii):
        return gstep(carry, ii, consts_d)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            dict(
                X=spec_state, Xhat=spec_state, prox=spec_state,
                keys=spec_state, theta=spec_data, sigma2=spec_data,
                params=spec_data,
            ),
            jax.tree_util.tree_map(lambda _: spec_data, consts),
            P(),
        ),
        out_specs=(
            dict(
                X=spec_state, Xhat=spec_state, prox=spec_state,
                keys=spec_state, theta=spec_data, sigma2=spec_data,
                params=spec_data,
            ),
            spec_data,
        ),
        check_vma=False,
    )
    def sharded_step(state, consts_l, ii):
        def one(X, Xhat, prox, keys, theta, sigma2, params, consts_d):
            carry = (X, Xhat, prox, keys, theta, sigma2, params, {})
            (Xn, Xhatn, proxn, keysn, thetan, sigman, paramsn, _), trace = gstep(
                carry, ii, consts_d
            )
            return (Xn, Xhatn, proxn, keysn, thetan, sigman, paramsn), trace

        (Xn, Xhatn, proxn, keysn, thetan, sigman, paramsn), trace = jax.vmap(one)(
            state["X"], state["Xhat"], state["prox"], state["keys"],
            state["theta"], state["sigma2"], state["params"], consts_l,
        )
        new_state = dict(
            X=Xn, Xhat=Xhatn, prox=proxn, keys=keysn,
            theta=thetan, sigma2=sigman, params=paramsn,
        )
        return new_state, trace["theta"]

    def make_full_state(key):
        """Materialise the initial sharded state with explicit placements.

        Every process computes the same full host values; jax.device_put with
        a NamedSharding takes each process's addressable shards, so this
        works identically single-process and under jax.distributed
        (multi-host), where no process can address the whole mesh.
        """
        X0, keys = init_state(key)
        prox0 = jax.vmap(lambda Xd, c: aux["prox_b"](Xd, c["lam"] * aux["theta0"])[0])(
            X0, consts
        )
        state = dict(
            X=X0,
            Xhat=jnp.fft.rfft2(X0),
            prox=prox0,
            keys=keys,
            theta=theta0,
            sigma2=sigma0,
            params=params0,
        )
        specs = dict(
            X=spec_state, Xhat=spec_state, prox=spec_state, keys=spec_state,
            theta=spec_data, sigma2=spec_data,
            params={k: spec_data for k in params0},
        )
        return jax.tree_util.tree_map(
            lambda v, sp: _to_global(v, NamedSharding(mesh, sp)),
            state,
            specs,
            is_leaf=lambda v: isinstance(v, (jnp.ndarray, np.ndarray)),
        )

    return dict(
        step=sharded_step,
        make_state=make_full_state,
        consts=consts,
        aux=aux,
        mesh=mesh,
        n_chains=C,
    )


def run_sapg_sharded(problems, mesh, key, chains_per_shard=1, n_steps=100):
    """Run n_steps sharded SAPG iterations (after implicit warm start at y).

    Returns the final state and the theta trace (D, n_steps).  Used by the
    multi-chip dry-run and the sharding-invariance tests; the full-featured
    single-problem path with complete diagnostics is sapg.run_sapg.
    """
    built = build_sharded_sapg(problems, mesh, chains_per_shard)
    state = built["make_state"](key)
    step = built["step"]
    consts = built["consts"]

    def body(state, ii):
        return step(state, consts, ii)

    iis = jnp.arange(2, n_steps + 2, dtype=jnp.float32)
    state, thetas = jax.jit(lambda s: jax.lax.scan(body, s, iis))(state)
    return state, np.asarray(thetas).T
